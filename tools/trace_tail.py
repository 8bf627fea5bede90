"""Variant-trace the NMS-tail kernels (docs/perf_notes.md method).

Wall-clock micro-timings through the axon tunnel are dispatch-bound and
CANNOT see sub-2 ms kernels; this script instead jits each kernel variant
as its OWN module (distinct module name -> distinct "XLA Modules" row in
the profiler trace), dispatches each ITERS times with a rolling input to
defeat CSE, and reports per-execution device time parsed from the trace.

  python tools/trace_tail.py                # all variant groups, real chip
  python tools/trace_tail.py --group scan   # just the greedy-scan sweep

Variant groups:
  scan      nms_keep_mask_pallas ranks_per_step sweep (1..25)
  finalize  finalize_candidates (column-form kernel)
  compact   compact_and_pad: pallas kernel vs the XLA vmap tail
  scores    anchor-score kernel: slice vs lane-masked formulations
  topm      gather-decode top-m: serial extract vs all-pairs rank
  pairtopk  stage-2 merged ranking: approx_max_k vs deterministic
            threshold-select + k-wide re-rank (VIDDET_PAIR_TOPK=det)
  glue      the XLA class-offset + compact tail for attribution
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=73728"

ITERS = 20


def _named(fn, name):
    fn.__name__ = name
    return fn


def build_variants(group, b, k, topk, m, j, c, interpret=False):
    import jax
    import jax.numpy as jnp

    from viddet_tpu.ops.nms import _class_offset, _compact_and_pad
    from viddet_tpu.ops.nms_gather_pallas import finalize_candidates
    from viddet_tpu.ops.nms_pallas import nms_keep_mask_pallas

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    ctr = jax.random.uniform(ks[0], (b, k, 2), minval=0.0, maxval=416.0)
    sz = jax.random.uniform(ks[1], (b, k, 2), minval=4.0, maxval=80.0)
    boxes = jnp.concatenate([ctr - sz / 2, ctr + sz / 2], axis=-1)
    valid = jax.random.uniform(ks[2], (b, k)) > 0.1
    scores = -jnp.sort(-jax.random.uniform(ks[3], (b, topk)))
    i_m = jax.random.randint(ks[4], (b, k, m), 0, c)
    hot_idx = jax.random.randint(ks[5], (b, 1, j), 0, k)
    q = jax.random.randint(ks[6], (b, topk), 0, k * (m - 1) + j * c)
    cls_idx = jax.random.randint(ks[7], (b, topk), 0, c).astype(jnp.float32)

    variants = []

    def chain(body, n_args):
        """ITERS sequential calls, input rolled by the iteration index along
        batch so XLA cannot CSE the repeated kernel call."""

        def run(*args):
            acc = jnp.float32(0.0)
            for i in range(ITERS):
                rolled = [jnp.roll(a, i, axis=0) for a in args]
                acc = acc + body(*rolled)
            return acc

        return run

    if group in ("all", "scan"):
        for r in (1, 2, 4, 8, 16, 25):
            body = _named(
                chain(
                    lambda bb, vv, _r=r: jnp.sum(
                        nms_keep_mask_pallas(
                            bb, vv, 0.45, ranks_per_step=_r,
                            interpret=interpret,
                        )
                    ),
                    2,
                ),
                f"scan_r{r}",
            )
            variants.append((f"scan_r{r}", body, (boxes, valid)))

    if group in ("all", "finalize"):
        body = _named(
            chain(
                lambda im, hi, qq, bk: sum(
                    jnp.sum(o)
                    for o in finalize_candidates(
                        im, hi, qq, bk, num_classes=c, interpret=interpret
                    )
                ),
                4,
            ),
            "finalize",
        )
        variants.append(("finalize", body, (i_m, hot_idx, q, boxes)))

    if group in ("all", "compact"):
        from viddet_tpu.ops.nms_pallas import compact_and_pad_pallas

        keepf = (valid & (scores > 0.001)).astype(jnp.float32)

        def compact_pallas_once(bb, sc, ci, kf):
            out = compact_and_pad_pallas(
                kf, sc, ci, bb, 100, interpret=interpret
            )
            return sum(jnp.sum(o) for o in out)

        def compact_xla_once(bb, sc, ci, kf):
            import jax as _jax

            out = _jax.vmap(_compact_and_pad, in_axes=(0, 0, 0, 0, None))(
                bb, sc, ci, kf > 0.5, 100
            )
            return sum(jnp.sum(o) for o in out)

        variants.append((
            "compact_pallas",
            _named(chain(compact_pallas_once, 4), "compact_pallas"),
            (boxes, scores, cls_idx, keepf),
        ))
        variants.append((
            "compact_xla",
            _named(chain(compact_xla_once, 4), "compact_xla"),
            (boxes, scores, cls_idx, keepf),
        ))

    if group in ("all", "scores"):
        # anchor-score kernel formulations: misaligned-slice (production)
        # vs full-width lane-masked reductions (candidate — see
        # _score_kernel_masked).  Both exact; flip the production default
        # with VIDDET_SCORE_KERNEL=masked if this shows masked faster.
        from viddet_tpu.ops.nms_gather_pallas import anchor_scores

        na = 3
        anchors_416 = (
            ((116, 90), (156, 198), (373, 326)),
            ((30, 61), (62, 45), (59, 119)),
            ((10, 13), (16, 30), (33, 23)),
        )
        raws, meta = [], []
        rkey = jax.random.split(key, 4)
        for si, (anc, st) in enumerate(zip(anchors_416, (32, 16, 8))):
            h = w = 416 // st
            raws.append(jax.random.normal(
                rkey[si], (b, h * w, na * (5 + c))
            ).astype(jnp.bfloat16))
            meta.append((h * w, w, st, tuple(
                (float(x), float(y)) for x, y in anc
            )))
        meta = tuple(meta)

        def scores_once(variant):
            def body(*rs):
                return jnp.sum(anchor_scores(
                    tuple(rs), meta, interpret=interpret, variant=variant
                ))
            return body

        variants.append((
            "scores_slice",
            _named(chain(scores_once("slice"), len(raws)), "scores_slice"),
            tuple(raws),
        ))
        variants.append((
            "scores_masked",
            _named(chain(scores_once("masked"), len(raws)), "scores_masked"),
            tuple(raws),
        ))

    if group in ("all", "topm"):
        # gather-decode kernel top-m formulations: serial argmax-extract
        # (production) vs parallel all-pairs rank (candidate — see
        # _extract_top_m_rank).  Both bit-identical; flip the production
        # default with VIDDET_TOPM_KERNEL=rank if this shows rank faster.
        from viddet_tpu.ops.nms_gather_pallas import gather_decode_pairs

        na = 3
        anchors_416 = (
            ((116, 90), (156, 198), (373, 326)),
            ((30, 61), (62, 45), (59, 119)),
            ((10, 13), (16, 30), (33, 23)),
        )
        raws, meta = [], []
        rkey = jax.random.split(jax.random.key(1), 4)
        for si, (anc, st) in enumerate(zip(anchors_416, (32, 16, 8))):
            h = w = 416 // st
            raws.append(jax.random.normal(
                rkey[si], (b, h * w, na * (5 + c))
            ).astype(jnp.bfloat16))
            meta.append((h * w, w, st, tuple(
                (float(x), float(y)) for x, y in anc
            )))
        meta = tuple(meta)
        n_total = sum(mm[0] for mm in meta) * na
        aidx = jax.random.randint(rkey[3], (b, k), 0, n_total)

        def topm_once(variant):
            def body(*args):
                rs, ai = args[:-1], args[-1]
                outs = gather_decode_pairs(
                    tuple(rs), ai, meta, extract_m=m, hot_j=j,
                    interpret=interpret, topm_variant=variant,
                )
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return body

        variants.append((
            "topm_extract",
            _named(chain(topm_once("extract"), len(raws) + 1), "topm_extract"),
            tuple(raws) + (aidx,),
        ))
        variants.append((
            "topm_rank",
            _named(chain(topm_once("rank"), len(raws) + 1), "topm_rank"),
            tuple(raws) + (aidx,),
        ))

    if group in ("all", "pairtopk"):
        # stage-2 merged-ranking formulations at the flagship hier width
        # (k*(m-1) + j*c = 6800) and the dense two-stage width (k*c =
        # 32000): approx_max_k (production) vs the deterministic
        # threshold-select + stable k-wide re-rank (_pair_top_k_det).
        # Flip the default with VIDDET_PAIR_TOPK=det if det is faster —
        # it is also the bit-for-bit tie-order fix (PARITY.md).
        from viddet_tpu.ops.nms import _pair_top_k_det

        for label, width in (("hier", k * (m - 1) + j * c), ("dense", k * c)):
            pk = jax.random.split(jax.random.key(2 + len(label)), 2)
            merged = jax.random.uniform(pk[0], (b, width))
            # sprinkle the hier path's -1.0 dedup sentinels
            sent = jax.random.uniform(pk[1], (b, width)) < 0.05
            merged = jnp.where(sent, -1.0, merged)

            def approx_once(ms, _topk=topk):
                v, i = jax.lax.approx_max_k(ms, _topk, recall_target=1.0)
                return jnp.sum(v) + jnp.sum(i).astype(jnp.float32)

            def det_once(ms, _topk=topk):
                v, i = _pair_top_k_det(ms, _topk, interpret=interpret)
                return jnp.sum(v) + jnp.sum(i).astype(jnp.float32)

            variants.append((
                f"pair_approx_{label}",
                _named(chain(approx_once, 1), f"pair_approx_{label}"),
                (merged,),
            ))
            variants.append((
                f"pair_det_{label}",
                _named(chain(det_once, 1), f"pair_det_{label}"),
                (merged,),
            ))

    if group in ("all", "glue"):
        import jax as _jax

        def glue_once(bb, sc, ci, vv):
            off = _jax.vmap(_class_offset)(bb, ci)
            keep = vv & (sc > 0.001)
            out = _jax.vmap(_compact_and_pad, in_axes=(0, 0, 0, 0, None))(
                bb, sc, ci, keep, 100
            )
            return sum(jnp.sum(o) for o in out) + jnp.sum(off)

        body = _named(chain(glue_once, 4), "glue")
        variants.append(("glue", body, (boxes, scores, cls_idx, valid)))

    return variants


def parse_trace(outdir):
    """Aggregate device time per 'XLA Modules' row (one row per jit module)."""
    per_mod = defaultdict(float)
    counts = defaultdict(int)
    for path in glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            name = ev.get("name", "")
            if ev.get("ph") == "X" and name.startswith("jit_"):
                mod = name.split("(")[0]
                per_mod[mod] += ev.get("dur", 0.0)
                counts[mod] += 1
    return per_mod, counts


def main(argv=None):
    from viddet_tpu.cli.common import enable_cache_from_env

    enable_cache_from_env()
    p = argparse.ArgumentParser()
    p.add_argument("--group", default="all",
                   choices=("all", "scan", "finalize", "glue", "compact",
                            "scores", "topm", "pairtopk"))
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--topk", type=int, default=400)
    p.add_argument("--classes", type=int, default=80)
    p.add_argument("--out", default="/tmp/tail_trace")
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    p.add_argument("--interpret", action="store_true",
                   help="interpret-mode kernels (CPU smoke test)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)

    m, j = 9, min((args.topk - 1) // 9 + 1, args.topk)
    variants = build_variants(
        args.group, args.batch, args.topk, args.topk, m, j, args.classes,
        interpret=args.interpret,
    )
    jitted = [(name, jax.jit(fn), inputs) for name, fn, inputs in variants]
    for name, fn, inputs in jitted:  # compile + warm outside the trace
        np.asarray(fn(*inputs))
        print(f"warmed {name}", flush=True)

    jax.profiler.start_trace(args.out)
    outs = [fn(*inputs) for _, fn, inputs in jitted]
    np.asarray(outs[-1])
    jax.profiler.stop_trace()

    per_mod, counts = parse_trace(args.out)
    if not per_mod:
        # Fallback (non-TPU traces lack "XLA Modules" rows): top raw events.
        raw = defaultdict(float)
        for path in glob.glob(
            os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True
        ):
            with gzip.open(path, "rt") as f:
                for ev in json.load(f).get("traceEvents", []):
                    if ev.get("ph") == "X":
                        raw[ev.get("name", "?")] += ev.get("dur", 0.0)
        print("\nno jit_* module rows found; top events by total dur:")
        for name, dur in sorted(raw.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {dur / 1e3:10.3f} ms  {name[:90]}")
        return
    print(f"\nper-execution device time (ITERS={ITERS} kernel calls/module):")
    for mod in sorted(per_mod):
        # one traced execution per module; dur is summed across trace rows
        # that repeat the module (metadata duplicates are rare) — report the
        # per-kernel-call figure.
        ms = per_mod[mod] / 1e3 / counts[mod] / ITERS
        print(f"  {mod:24s} {ms:8.4f} ms/call  (rows={counts[mod]})")


if __name__ == "__main__":
    main()
