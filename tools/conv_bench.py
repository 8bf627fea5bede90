"""Micro-benchmark: fused stride-2 Conv+BN+Leaky Pallas kernel vs XLA.

Times the three shallow Darknet-53 downsample convs (the layers the v5e
profile shows far from speed-of-light — docs/perf_notes.md) for both
backends and checks numerical agreement on-chip.

  python tools/conv_bench.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=73728"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    p.add_argument("--rows-per-chunk", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.ops.conv_pallas import (
        conv_down2_bn_leaky,
        conv_down2_bn_leaky_reference,
    )

    cases = [  # (name, H, Cin, Cout) — Darknet-53 downsample convs
        ("conv1 32->64 @416", 416, 32, 64),
        ("conv2 64->128 @208", 208, 64, 128),
        ("down3 128->256 @104", 104, 128, 256),
        ("down4 256->512 @52", 52, 256, 512),
    ]

    def timed(f, *xs):
        np.asarray(jax.block_until_ready(f(*xs)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = f(*xs)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    rng = np.random.default_rng(0)
    for name, h, cin, cout in cases:
        x = jnp.asarray(rng.normal(size=(args.batch, h, h, cin))).astype(jnp.bfloat16)
        k = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32))
        sc = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
        bi = jnp.asarray(rng.normal(size=cout).astype(np.float32))
        mu = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
        va = jnp.asarray(rng.uniform(0.5, 2.0, cout).astype(np.float32))

        ref_fn = jax.jit(conv_down2_bn_leaky_reference)
        pal_fn = lambda *a: conv_down2_bn_leaky(
            *a, rows_per_chunk=args.rows_per_chunk
        )
        ref = ref_fn(x, k, sc, bi, mu, va)
        try:
            got = pal_fn(x, k, sc, bi, mu, va)
            err = float(
                jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
            )
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            t_pal = timed(pal_fn, x, k, sc, bi, mu, va)
        except Exception as e:  # keep sweeping other shapes
            print(f"{name}: pallas FAILED: {type(e).__name__}: {str(e)[:200]}")
            err, scale, t_pal = float("nan"), 0.0, float("nan")
        t_ref = timed(ref_fn, x, k, sc, bi, mu, va)
        print(
            f"{name}: xla {t_ref:7.3f} ms   pallas {t_pal:7.3f} ms   "
            f"err {err:.4f}/{scale:.1f}"
        )


if __name__ == "__main__":
    main()
