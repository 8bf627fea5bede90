"""Bit-exactness of the fused gather-decode NMS path vs the XLA chain.

The fused path (ops/nms_gather_pallas.py + multiclass_nms_late_decode_fused)
must produce byte-identical detections to multiclass_nms_late_decode — the
gather is an exact one-hot matmul over grid cells, the decode constants are
recomputed with provably-exact f32 integer arithmetic, and every float op
runs in the same order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.ops.nms import (
    multiclass_nms_late_decode,
    multiclass_nms_late_decode_fused,
)
from viddet_tpu.ops.nms_gather_pallas import (
    gather_decode_pairs,
    scale_constants_np,
)

ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),
    ((30, 61), (62, 45), (59, 119)),
    ((10, 13), (16, 30), (33, 23)),
)
STRIDES = (32, 16, 8)


def _make_scales(rng, b, img, c, dtype=jnp.bfloat16):
    """Returns per-scale cell-layout raws, static meta, concat consts, and
    the anchor-layout concat raw tensor for the oracle."""
    cells_raws, meta, consts, flat_raws = [], [], [], []
    na = 3
    for anc, st in zip(ANCHORS, STRIDES):
        h = w = img // st
        n = h * w * na
        r = jnp.asarray(
            rng.normal(size=(b, n, 5 + c)).astype(np.float32)
        ).astype(dtype)
        flat_raws.append(r)
        cells_raws.append(r.reshape(b, h * w, na * (5 + c)))
        meta.append(
            (h * w, w, st, tuple((float(x), float(y)) for x, y in anc))
        )
        consts.append(scale_constants_np(h, w, anc, st))
    return cells_raws, tuple(meta), np.concatenate(consts, axis=0), flat_raws


def test_gather_decode_pairs_bit_exact():
    rng = np.random.default_rng(0)
    b, img, c, k = 3, 64, 20, 40
    cells, meta, consts, flat = _make_scales(rng, b, img, c)
    n = consts.shape[0]
    a_idx = jnp.asarray(rng.integers(0, n, size=(b, k)).astype(np.int32))

    boxes, pairs = gather_decode_pairs(
        tuple(cells), a_idx, meta, interpret=True
    )

    raw = jnp.concatenate(flat, axis=1)
    g = jnp.take_along_axis(raw, a_idx[..., None], axis=1).astype(jnp.float32)
    cj = jnp.asarray(consts)
    gc = cj[a_idx]
    xy = jax.nn.sigmoid(g[..., 0:2])
    wh = jnp.exp(g[..., 2:4])
    center = (xy + gc[..., 0:2]) * gc[..., 4:5]
    half = 0.5 * (wh * gc[..., 2:4])
    want_boxes = jnp.concatenate([center - half, center + half], axis=-1)
    want_pairs = jax.nn.sigmoid(g[..., 4:5]) * jax.nn.sigmoid(g[..., 5:])

    assert bool(jnp.all(boxes == want_boxes))
    assert bool(jnp.all(pairs == want_pairs))


def test_fused_late_decode_matches_xla_chain():
    rng = np.random.default_rng(1)
    b, img, c = 2, 64, 20
    cells, meta, consts, flat = _make_scales(rng, b, img, c)

    raw = jnp.concatenate(flat, axis=1)
    cls_max = jnp.max(raw[..., 5:], axis=-1)
    obj_logit = raw[..., 4]
    cj = jnp.asarray(consts)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=40, post_nms=10)

    ids_x, sc_x, bx_x = multiclass_nms_late_decode(
        raw[..., 0:2].astype(jnp.float32),
        raw[..., 2:4].astype(jnp.float32),
        raw[..., 4:5],
        raw[..., 5:],
        cls_max,
        cj[:, 0:2],
        cj[:, 2:4],
        cj[:, 4:5],
        backend="xla",
        **kw,
    )
    ids_p, sc_p, bx_p = multiclass_nms_late_decode_fused(
        tuple(cells), None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x))
    np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x))


def test_hier_pigeonhole_adversarial_hot_box():
    """Adversarial case: one box whose classes ALL rank in the global
    top-k.  The pigeonhole repair set must supply the classes beyond the
    per-box top-(m-1), so the selected score multiset matches the full
    ranking exactly (individual ids may tie-swap)."""
    rng = np.random.default_rng(7)
    b, img, c = 1, 64, 20
    cells, meta, consts, flat = _make_scales(rng, b, img, c)
    # One cell's first anchor: huge objectness, all classes equal and huge.
    hot = np.array(cells[0], copy=True)
    hot[0, 1, 0 : 5 + c] = 0.0
    hot[0, 1, 4] = 8.0  # obj
    hot[0, 1, 5 : 5 + c] = 6.0  # 20 tied strong classes
    cells[0] = jnp.asarray(hot)
    flat0 = cells[0].reshape(b, -1, 5 + c)
    flat = [flat0] + flat[1:]

    raw = jnp.concatenate(flat, axis=1)
    cls_max = jnp.max(raw[..., 5:], axis=-1)
    cj = jnp.asarray(consts)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=40, post_nms=30)

    _, sc_x, _ = multiclass_nms_late_decode(
        raw[..., 0:2].astype(jnp.float32),
        raw[..., 2:4].astype(jnp.float32),
        raw[..., 4:5],
        raw[..., 5:],
        cls_max,
        cj[:, 0:2],
        cj[:, 2:4],
        cj[:, 4:5],
        backend="xla",
        **kw,
    )
    _, sc_p, _ = multiclass_nms_late_decode_fused(
        tuple(cells), None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(sc_p), axis=1), np.sort(np.asarray(sc_x), axis=1)
    )


def test_forward_and_postprocess_backend_parity():
    """Whole-model check: pallas_interpret (fused path) == xla backend."""
    from viddet_tpu.models.yolo3 import NMSConfig, YOLOv3, forward_and_postprocess
    from viddet_tpu.core.precision import Policy

    policy = Policy(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    module = YOLOv3(num_classes=4, backbone="tiny", policy=policy)
    images = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.key(1), images, train=False)

    ids_x, sc_x, bx_x = forward_and_postprocess(
        module, variables, images, NMSConfig(topk=40, post_nms=10, backend="xla")
    )
    ids_p, sc_p, bx_p = forward_and_postprocess(
        module,
        variables,
        images,
        NMSConfig(topk=40, post_nms=10, backend="pallas_interpret"),
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x))
    np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x))


def test_anchor_scores_masked_variant_bit_exact():
    """The lane-masked score kernel must equal the slice kernel and the
    XLA oracle bitwise in bf16 AND f32 (masked -inf max == sliced max in
    the same dtype; upcast and sigmoids identical)."""
    from viddet_tpu.ops.nms_gather_pallas import anchor_scores

    rng = np.random.default_rng(11)
    for dtype in (jnp.bfloat16, jnp.float32):
        cells_raws, meta, _consts, flat_raws = _make_scales(
            rng, b=2, img=64, c=7, dtype=dtype
        )
        ref = anchor_scores(
            tuple(cells_raws), meta, interpret=True, variant="slice"
        )
        out = anchor_scores(
            tuple(cells_raws), meta, interpret=True, variant="masked"
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
        # and against the direct oracle on the anchor-layout tensors
        raw = jnp.concatenate(flat_raws, axis=1)
        obj = jax.nn.sigmoid(raw[..., 4].astype(jnp.float32))
        clsm = jax.nn.sigmoid(
            jnp.max(raw[..., 5:], axis=-1).astype(jnp.float32)
        )
        oracle = np.asarray(obj * clsm)
        # cell-layout order: per scale, (cell, anchor); flat_raws order is
        # (anchor-major per scale) already matching _make_scales' reshape
        np.testing.assert_array_equal(np.asarray(out), oracle)


def test_extract_top_m_rank_matches_serial_loop():
    """The parallel all-pairs rank must reproduce the serial argmax-extract
    loop bitwise: stable descending order (ties lowest-index-first),
    including heavy exact ties, negative values, the chunk-boundary
    remainder, and the degenerate m > C case (masked steps emit (-inf, 0)
    in both)."""
    from viddet_tpu.ops.nms_gather_pallas import (
        _extract_top_m,
        _extract_top_m_rank,
    )

    rng = np.random.default_rng(23)
    cases = [
        (jnp.asarray(rng.random((400, 80)).astype(np.float32)), 9, 64),
        # heavy exact ties: few distinct values
        (
            jnp.asarray(
                rng.integers(0, 4, size=(100, 20)).astype(np.float32) / 4.0
            ),
            9,
            32,
        ),
        # chunk boundary not dividing k
        (jnp.asarray(rng.random((37, 11)).astype(np.float32)), 5, 16),
        # m > C: extraction runs out of real entries
        (jnp.asarray(rng.random((8, 3)).astype(np.float32)), 5, 8),
        # logit-shaped: mostly < -1, one positive per row — the extraction
        # sentinel must never outrank real (negative) values
        (
            jnp.asarray(
                (rng.normal(size=(16, 6)) * 2.0 - 4.0).astype(np.float32)
            ),
            4,
            8,
        ),
    ]
    for pairs, m, rc in cases:
        v_ref, i_ref = jax.jit(_extract_top_m, static_argnums=1)(pairs, m)
        v_out, i_out = jax.jit(
            _extract_top_m_rank, static_argnums=(1, 2)
        )(pairs, m, rc)
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_out))
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_out))


def test_gather_topm_rank_variant_bit_exact():
    """gather_decode_pairs with topm_variant='rank' must equal the
    production 'extract' variant bitwise on every hierarchical output,
    end to end through the interpret-mode kernel."""
    rng = np.random.default_rng(29)
    b, img, c, k, m, j = 2, 64, 20, 40, 9, 5
    cells, meta, consts, _flat = _make_scales(rng, b, img, c)
    n = consts.shape[0]
    a_idx = jnp.asarray(rng.integers(0, n, size=(b, k)).astype(np.int32))

    ref = gather_decode_pairs(
        tuple(cells), a_idx, meta, extract_m=m, hot_j=j, interpret=True,
        topm_variant="extract",
    )
    out = gather_decode_pairs(
        tuple(cells), a_idx, meta, extract_m=m, hot_j=j, interpret=True,
        topm_variant="rank",
    )
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_gather_decode_pairs_production_width():
    """Bit-exactness at the PRODUCTION lane configuration (C=80 ->
    na*(5+C) = 255 lanes, m=9/hot_j hierarchy active) — the other tests
    use narrow C; lane padding and the m-step hierarchy must hold at the
    real width too."""
    rng = np.random.default_rng(41)
    b, img, c, k, m = 2, 64, 80, 40, 9
    j = min((k - 1) // m + 1, k)
    cells, meta, consts, flat = _make_scales(rng, b, img, c)
    n = consts.shape[0]
    a_idx = jnp.asarray(rng.integers(0, n, size=(b, k)).astype(np.int32))

    boxes, v_m, i_m, hot_flat, hot_idx = gather_decode_pairs(
        tuple(cells), a_idx, meta, extract_m=m, hot_j=j, interpret=True
    )

    raw = jnp.concatenate(flat, axis=1)
    g = jnp.take_along_axis(raw, a_idx[..., None], axis=1).astype(jnp.float32)
    pairs = jax.nn.sigmoid(g[..., 4:5]) * jax.nn.sigmoid(g[..., 5:])
    want_v, want_i = jax.vmap(
        lambda p: jax.lax.top_k(p, m)
    )(pairs)
    # v_m must match lax.top_k values exactly (stable-order ties included
    # for random f32 inputs, ties are measure-zero)
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(want_i))


def test_fused_late_decode_det_ranking_matches_xla(monkeypatch):
    """Fused path under VIDDET_PAIR_TOPK=det (deterministic stage-2
    ranking): pallas_interpret must stay bit-identical to the XLA chain
    through the hierarchical merged ranking.  Unique static args (topk,
    post_nms) force a retrace so the monkeypatched trace-time env knob is
    actually read."""
    monkeypatch.setenv("VIDDET_PAIR_TOPK", "det")
    rng = np.random.default_rng(5)
    b, img, c = 2, 64, 20
    cells, meta, consts, flat = _make_scales(rng, b, img, c)

    raw = jnp.concatenate(flat, axis=1)
    cls_max = jnp.max(raw[..., 5:], axis=-1)
    cj = jnp.asarray(consts)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=48, post_nms=12)

    ids_x, sc_x, bx_x = multiclass_nms_late_decode(
        raw[..., 0:2].astype(jnp.float32),
        raw[..., 2:4].astype(jnp.float32),
        raw[..., 4:5],
        raw[..., 5:],
        cls_max,
        cj[:, 0:2],
        cj[:, 2:4],
        cj[:, 4:5],
        backend="xla",
        **kw,
    )
    ids_p, sc_p, bx_p = multiclass_nms_late_decode_fused(
        tuple(cells), None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x))
    np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x))


import pytest


def _oracle_late_decode(raw, consts, backend, **kw):
    cls_max = jnp.max(raw[..., 5:], axis=-1)
    cj = jnp.asarray(consts)
    return multiclass_nms_late_decode(
        raw[..., 0:2].astype(jnp.float32),
        raw[..., 2:4].astype(jnp.float32),
        raw[..., 4:5], raw[..., 5:], cls_max,
        cj[:, 0:2], cj[:, 2:4], cj[:, 4:5],
        backend=backend, **kw,
    )


@pytest.mark.slow
def test_fused_late_decode_fuzz_configs():
    """Config fuzz: the fused path must stay bit-identical to the XLA
    chain across class counts (hier and non-hier regimes), topk values,
    image sizes, and batch sizes — not just the two fixed-seed configs
    above.  f32 raws: random normals never tie in f32, so strict
    bit-equality is the correct oracle for the approx ranking (its tie
    latitude is documented; the bf16 tie regime is pinned separately by
    test_fused_det_bit_exact_under_bf16_ties).  Interpret-mode; slow
    (one compile per config on CPU)."""
    cases = [
        # (b, img, c, topk, post_nms) — c=6 stays below the hier m+1=10
        # threshold; c=20/33 exercise the pigeonhole path at different
        # topk/width ratios; the last config forces the k*c < topk pad
        # branch (img=32 -> n=63 anchors, k=min(400,63)=63, k*c=378<400)
        (1, 32, 6, 24, 8),
        (2, 64, 20, 96, 24),
        (3, 64, 33, 40, 20),
        (2, 96, 20, 160, 40),
        (1, 32, 6, 400, 32),
    ]
    # Layouts fuzzed per config: every case runs the cells layout; the
    # starred ones ALSO run the 4-D conv layout (VIDDET_TAIL_INPUT=conv
    # equivalent), chosen for maximal sublane padding — img=32 gives
    # W=1/2/4 -> Wp=8 (and topk=400 > n_real=63 exercises the
    # k-capped-at-real-N pad-unselectability invariant), img=96 gives
    # W=3/6/12 -> Wp=8/8/16.
    conv_cases = {0, 3, 4}
    for seed, (b, img, c, topk, post_nms) in enumerate(cases, start=50):
        rng = np.random.default_rng(seed)
        cells, meta, consts, flat = _make_scales(
            rng, b, img, c, dtype=jnp.float32
        )
        raw = jnp.concatenate(flat, axis=1)
        kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=topk,
                  post_nms=post_nms)
        ids_x, sc_x, bx_x = _oracle_late_decode(raw, consts, "xla", **kw)
        layouts = [tuple(cells)]
        if seed - 50 in conv_cases:
            layouts.append(_to_conv(cells, meta))
        for raws_in in layouts:
            ids_p, sc_p, bx_p = multiclass_nms_late_decode_fused(
                raws_in, None, meta, backend="pallas_interpret", **kw
            )
            msg = f"config {(b, img, c, topk, post_nms)} ndim={raws_in[0].ndim}"
            np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x), err_msg=msg)
            np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x), err_msg=msg)
            np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x), err_msg=msg)


def test_fused_bf16_tie_latitude_is_score_multiset_only(monkeypatch):
    """bf16 raws (seed 52, c=33) produce EXACT score ties whose order
    differs between the hier merged layout and the flat pair order —
    the documented approx-path latitude.  Assert it stays tie-shaped:
    sorted score multisets equal (found by the round-4 config fuzz)."""
    monkeypatch.delenv("VIDDET_PAIR_TOPK", raising=False)
    rng = np.random.default_rng(52)
    b, img, c = 3, 64, 33
    cells, meta, consts, flat = _make_scales(rng, b, img, c)  # bf16
    raw = jnp.concatenate(flat, axis=1)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=40, post_nms=20)
    _, sc_x, _ = _oracle_late_decode(raw, consts, "xla", **kw)
    _, sc_p, _ = multiclass_nms_late_decode_fused(
        tuple(cells), None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(sc_p), axis=1), np.sort(np.asarray(sc_x), axis=1)
    )


def test_fused_det_bit_exact_under_bf16_ties(monkeypatch):
    """VIDDET_PAIR_TOPK=det must be bit-identical to the XLA chain even
    on the tie-heavy bf16 input that makes the approx path swap rows
    (same seed as above): under det the fused path skips the hier
    layout and ranks the full k*C width with the threshold-select
    kernel, whose selection AND tie order equal lax.top_k's exactly."""
    monkeypatch.setenv("VIDDET_PAIR_TOPK", "det")
    rng = np.random.default_rng(52)
    b, img, c = 3, 64, 33
    cells, meta, consts, flat = _make_scales(rng, b, img, c)  # bf16
    raw = jnp.concatenate(flat, axis=1)
    # distinct static args from the approx test above -> forced retrace
    # (the env knob is read at trace time)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=44, post_nms=22)
    ids_x, sc_x, bx_x = _oracle_late_decode(raw, consts, "xla", **kw)
    ids_p, sc_p, bx_p = multiclass_nms_late_decode_fused(
        tuple(cells), None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x))
    np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x))


def _to_conv(cells, meta):
    """Cell-layout raws -> the output convs' native 4-D (B, h, w, lanes)."""
    return tuple(
        r.reshape(r.shape[0], m[0] // m[1], m[1], r.shape[-1])
        for r, m in zip(cells, meta)
    )


def _pad_space(meta):
    """Real->padded flat-index map + padded per-scale meta (must mirror
    ops/nms_gather_pallas._conv_dims: Wp = roundup(W, 8))."""
    na = len(meta[0][3])
    real_off, pad_off, spans = 0, 0, []
    for cells, w, _st, _anc in meta:
        h, wp = cells // w, -(-w // 8) * 8
        spans.append((real_off, cells * na, w, wp, pad_off))
        real_off += cells * na
        pad_off += h * wp * na
    def to_pad(i):
        for r0, n_s, w, wp, p0 in spans:
            if r0 <= i < r0 + n_s:
                local = i - r0
                cell, a = divmod(local, na)
                gy, gx = divmod(cell, w)
                return p0 + (gy * wp + gx) * na + a
        raise AssertionError(i)
    return to_pad, pad_off


def test_conv_input_bit_exact():
    """4-D conv-layout inputs (VIDDET_TAIL_INPUT=conv) must equal the
    cell-layout path bitwise on EVERY kernel output.  The kernels run on
    a PADDED cell space (Wp = roundup(W, 8), pad rows filled with -1e9 so
    Mosaic can lower the sublane merge): scores map position-for-position
    through the monotone real->padded index map with pad rows exactly
    0.0, and the gather given padded indices returns bit-identical rows."""
    from viddet_tpu.ops.nms_gather_pallas import anchor_scores

    rng = np.random.default_rng(53)
    # One interpret-mode jit per load-bearing combination (each costs
    # ~2-3s of fast-suite time): both score variants and the hier gather
    # in production bf16; the dense gather additionally in f32, which
    # exercises the Precision.HIGHEST one-hot branch.
    k, m_, j = 40, 9, 5
    for dtype, variants, gather_kws in (
        (
            jnp.bfloat16,
            ("slice", "masked"),
            (dict(), dict(extract_m=m_, hot_j=j)),
        ),
        (jnp.float32, (), (dict(),)),
    ):
        cells, meta, consts, _flat = _make_scales(
            rng, b=2, img=64, c=20, dtype=dtype
        )
        conv = _to_conv(cells, meta)
        to_pad, n_pad = _pad_space(meta)
        n = consts.shape[0]
        pad_pos = np.array([to_pad(i) for i in range(n)])
        for variant in variants:
            ref = np.asarray(
                anchor_scores(
                    tuple(cells), meta, interpret=True, variant=variant
                )
            )
            out = np.asarray(
                anchor_scores(conv, meta, interpret=True, variant=variant)
            )
            assert out.shape == (2, n_pad)
            np.testing.assert_array_equal(ref, out[:, pad_pos])
            mask = np.ones(n_pad, bool)
            mask[pad_pos] = False
            # pad rows must score EXACTLY 0.0 — the unselectability proof
            np.testing.assert_array_equal(out[:, mask], 0.0)
        a_idx = rng.integers(0, n, size=(2, k)).astype(np.int32)
        a_idx_pad = jnp.asarray(np.vectorize(to_pad)(a_idx))
        a_idx = jnp.asarray(a_idx)
        for kw in gather_kws:
            ref = gather_decode_pairs(
                tuple(cells), a_idx, meta, interpret=True, **kw
            )
            out = gather_decode_pairs(
                conv, a_idx_pad, meta, interpret=True, **kw
            )
            for rr, oo in zip(ref, out):
                # every output (boxes, pair scores, v_m, i_m, hot rows,
                # hot_idx) indexes classes or the k candidates — none is
                # in cell space, so all must match bitwise
                np.testing.assert_array_equal(np.asarray(rr), np.asarray(oo))


def test_fused_late_decode_conv_input_matches_xla():
    """End-to-end fused NMS on 4-D conv-layout inputs == the XLA oracle,
    bitwise (same gate as test_fused_late_decode_matches_xla, different
    input layout)."""
    rng = np.random.default_rng(59)
    b, img, c = 3, 64, 20
    cells, meta, consts, flat = _make_scales(rng, b, img, c)
    conv = _to_conv(cells, meta)
    raw = jnp.concatenate(flat, axis=1)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=40, post_nms=20)
    ids_x, sc_x, bx_x = _oracle_late_decode(raw, consts, "xla", **kw)
    ids_p, sc_p, bx_p = multiclass_nms_late_decode_fused(
        conv, None, meta, backend="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_x))
    np.testing.assert_array_equal(np.asarray(bx_p), np.asarray(bx_x))


def test_forward_and_postprocess_tail_input_conv(monkeypatch):
    """Whole-model gate for the VIDDET_TAIL_INPUT=conv staging flag: the
    conv-layout fused path must be bit-identical to the default cells
    path (and a typo'd flag value must fail loudly)."""
    import pytest

    from viddet_tpu.models.yolo3 import (
        NMSConfig,
        YOLOv3,
        forward_and_postprocess,
    )
    from viddet_tpu.core.precision import Policy

    policy = Policy(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    module = YOLOv3(num_classes=4, backbone="tiny", policy=policy)
    images = jax.random.uniform(
        jax.random.key(0), (2, 64, 64, 3), jnp.float32
    )
    variables = module.init(jax.random.key(1), images, train=False)
    nms = NMSConfig(topk=40, post_nms=10, backend="pallas_interpret")

    ref = forward_and_postprocess(module, variables, images, nms)
    monkeypatch.setenv("VIDDET_TAIL_INPUT", "conv")
    out = forward_and_postprocess(module, variables, images, nms)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))

    monkeypatch.setenv("VIDDET_TAIL_INPUT", "conf")
    with pytest.raises(ValueError, match="VIDDET_TAIL_INPUT"):
        forward_and_postprocess(module, variables, images, nms)
