"""On-chip Pallas-vs-XLA parity check for every custom kernel.

The CPU test suite exercises the kernels in interpret mode; this script is
the REAL-HARDWARE gate (run on a TPU host):

  1. flagship YOLOv3-416 detections: pallas NMS backend == xla backend (f32)
  2. raw NMS keep mask: pallas kernel == jnp oracle on random stress inputs
  3. FPN ROIAlign: pallas window-DMA kernel == packed-gather oracle
  4. flagship at the BENCH configuration (default bf16 policy): tie-aware
     pallas == xla (sorted score multisets exact, non-tied rows 1:1)

  python tools/tpu_parity_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_nms_kernel():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.ops.nms import nms_keep_mask
    from viddet_tpu.ops.nms_pallas import nms_keep_mask_pallas

    rng = np.random.default_rng(0)
    b, k = 16, 400
    ctr = rng.uniform(0, 400, (b, k, 2))
    wh = rng.uniform(4, 120, (b, k, 2))
    boxes = jnp.asarray(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    )
    scores = jnp.asarray(
        -np.sort(-rng.uniform(size=(b, k)).astype(np.float32), axis=1)
    )
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.1)
    want = jax.vmap(
        lambda bx, sc, va: nms_keep_mask(bx, sc, va, 0.45)
    )(boxes, scores, valid)
    got = nms_keep_mask_pallas(boxes, valid, 0.45)
    np.testing.assert_array_equal(np.asarray(got) > 0.5, np.asarray(want) > 0.5)
    print("nms kernel: OK (16x400 stress, exact keep-mask match)")


def check_flagship():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.core.precision import FLOAT32_POLICY
    from viddet_tpu.models import get_model
    from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess

    module, _ = get_model("yolo3_darknet53_coco", policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(77).uniform(0, 1, (2, 416, 416, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(7), x, train=False)
    outs = {}
    for backend in ("xla", "pallas"):
        outs[backend] = [
            np.asarray(r) for r in forward_and_postprocess(
                module, variables, x, NMSConfig(backend=backend,
                                                valid_thresh=0.001)
            )
        ]
    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_allclose(outs["xla"][1], outs["pallas"][1], atol=1e-5)
    np.testing.assert_allclose(outs["xla"][2], outs["pallas"][2], atol=1e-3)
    kept = int((outs["xla"][0] >= 0).sum())
    print(f"flagship darknet53@416: OK (pallas == xla, {kept} detections)")


def check_flagship_bf16():
    """The EXACT bench configuration (default bf16 policy) regression gate.

    bf16 logits can collide, so exact score ties are realistic here and
    the pallas backend's documented tie-selection latitude (PARITY.md
    "Documented numerical deviations") applies — and it CASCADES: two
    tied boxes entering the greedy NMS scan in different orders can
    change which OTHER boxes get suppressed, so even the post-NMS score
    multiset may legitimately differ on a few entries (observed: one
    swapped suppression survivor out of ~100 on this fixture).  The gate
    therefore asserts the divergence stays tie-shaped: the score
    multisets' symmetric difference is a small fraction of the output,
    and rows are matched after rounding to 4 decimals (a 5e-5 tolerance:
    the two backends place their f32 upcasts at different points, so
    matching rows can differ in final ulps under the bf16 policy — this
    gate is a tolerance check, NOT the bit-for-bit gate; that is the f32
    ``check_flagship``).  A broken kernel (wrong gather, wrong decode,
    wrong ranking) diverges wholesale and fails both bounds.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.models import get_model
    from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess

    module, _ = get_model("yolo3_darknet53_coco")  # default bf16 policy
    x = jnp.asarray(
        np.random.default_rng(123).uniform(0, 1, (4, 416, 416, 3)), jnp.float32
    ).astype(jnp.bfloat16)
    variables = module.init(jax.random.key(3), x.astype(jnp.float32),
                            train=False)
    outs = {}
    for backend in ("xla", "pallas"):
        outs[backend] = [
            np.asarray(r) for r in forward_and_postprocess(
                module, variables, x,
                NMSConfig(backend=backend, valid_thresh=0.001),
            )
        ]
    ids_x, sc_x, bx_x = outs["xla"]
    ids_p, sc_p, bx_p = outs["pallas"]
    total = diverged = 0
    for i in range(x.shape[0]):
        def rows(ids, sc, bx):
            r = np.concatenate(
                [sc[i][:, None], ids[i][:, None].astype(np.float32), bx[i]], 1
            )
            r = r[ids[i] >= 0]
            return {tuple(np.round(row, 4)) for row in r}

        set_x = rows(ids_x, sc_x, bx_x)
        set_p = rows(ids_p, sc_p, bx_p)
        sym = len(set_x ^ set_p)
        total += max(len(set_x), len(set_p))
        diverged += sym
    frac = diverged / max(total, 1)
    # Under VIDDET_PAIR_TOPK=det the fused path is bit-identical to the
    # XLA oracle by construction — full-width deterministic ranking, hier
    # path bypassed, stage-1 re-ranked to lax.top_k order (PARITY.md
    # "Documented numerical deviations"; pinned on a tie-heavy bf16
    # fixture by test_fused_det_bit_exact_under_bf16_ties).  The expected
    # divergence is therefore ZERO; the 0.1% gate (0-1 rows on this
    # fixture) is slack for on-chip arithmetic surprises only — treat ANY
    # nonzero det-mode divergence as a kernel regression to investigate,
    # not as expected latitude.  The approx_max_k default keeps 10%
    # (unconstrained tie order cascading through greedy NMS).
    det = os.environ.get("VIDDET_PAIR_TOPK", "approx") == "det"
    limit = 0.001 if det else 0.10
    assert frac <= limit, (
        f"{diverged}/{total} detections differ between backends "
        f"(limit {limit:.1%}, VIDDET_PAIR_TOPK={'det' if det else 'approx'}) "
        "— beyond tie latitude, kernels have diverged"
    )
    print(
        f"flagship darknet53@416 bf16: OK ({total} detections, "
        f"{diverged} tie-cascade divergent = {100 * frac:.1f}%, "
        f"limit {limit:.1%})"
    )


def check_roi_align():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.ops.roi_align import multilevel_roi_align_packed
    from viddet_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    rng = np.random.default_rng(1)
    b, c, image = 2, 256, 512
    pyramid = [
        jnp.asarray(rng.normal(size=(b, image // s, image // s, c))
                    .astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    size = rng.uniform(16, image * 0.9, size=(b, 64))
    aspect = rng.uniform(0.4, 2.5, size=(b, 64))
    w = size * np.sqrt(aspect)
    h = size / np.sqrt(aspect)
    cx = rng.uniform(0, image, size=(b, 64))
    cy = rng.uniform(0, image, size=(b, 64))
    rois = jnp.asarray(np.clip(np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1
    ), 0, image).astype(np.float32))
    got = multilevel_roi_align_pallas(pyramid, rois, strides=(4, 8, 16, 32))
    want = jax.vmap(
        lambda maps, boxes: multilevel_roi_align_packed(
            maps, boxes, strides=(4, 8, 16, 32))
    )(pyramid, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    print("roi_align kernel: OK (2x64 rois, 512px pyramid, C=256)")


def main():
    from viddet_tpu.cli.common import enable_cache_from_env

    enable_cache_from_env()
    import jax

    print(f"platform: {jax.default_backend()}, devices: {jax.devices()}")
    check_nms_kernel()
    check_roi_align()
    check_flagship()
    check_flagship_bf16()
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
