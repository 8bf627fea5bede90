"""Fused stride-2 3x3 Conv+BN+LeakyReLU Pallas kernel for shallow stages.

Why this exists (profiler evidence, docs/perf_notes.md): the Darknet-53
downsample convs with Cin < 128 run far from speed-of-light under XLA on
TPU v5e — conv1 (32→64 @416→208) 3.96 ms vs a ~2.8 ms floor, conv2
(64→128 @208→104) 3.43 ms vs ~1.4 ms, stage-3 (128→256 @104→52) 3.56 ms
vs ~1.2 ms (batch 128).  The root cause is MXU padding: XLA's conv
lowering contracts over K = 9·Cin per partial product, and K < 128 wastes
the systolic array.  This kernel rebuilds the conv as ONE im2col matmul
with K = 9·Cin (288/576/1152 — chunked to the MXU's 128 alignment), with
the batch-norm affine (folded running stats) and leaky ReLU fused into the
epilogue so the activation never round-trips HBM between conv and
activation.

Semantics match ``lax.conv_general_dilated`` NHWC stride-2 SAME exactly:
pad_lo = 0, pad_hi = 1, i.e. out[i,j] = Σ_{dy,dx∈{0,1,2}} x[2i+dy, 2j+dx]·W[dy,dx]
with x zero-padded at row H and column W.

Capability parity: the reference's cuDNN conv kernels (SURVEY.md §3.2 N3);
this is the "custom Pallas only where XLA fuses poorly" case called out
there.  The jnp/XLA path in ``models/common.ConvBNLeaky`` remains the
oracle; ``tests/unit/test_conv_pallas.py`` pins parity.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_pairview(x_ref, w_ref, a_ref, b_ref, o_ref, *, rows_per_chunk, slope):
    """One image per grid step; input pre-viewed as (H2, 2, W2, 2*Cin).

    Loads are sliced straight from the ref per chunk (never materialize the
    whole block as a value) and the affine params are (1, Cout) 2-D — both
    required to keep Mosaic on the vector units.
    """
    h2 = x_ref.shape[1]
    w2 = x_ref.shape[3]
    cin = x_ref.shape[4] // 2
    r = rows_per_chunk
    w = w_ref[...]
    a = a_ref[...].astype(jnp.float32)  # (1, Cout)
    b = b_ref[...].astype(jnp.float32)
    n_chunks = h2 // r
    for c in range(n_chunks):
        r0 = c * r
        last = c == n_chunks - 1
        r_e = x_ref[0, r0 : r0 + r, 0]  # even input rows 2i  (r, W2, 2C)
        r_o = x_ref[0, r0 : r0 + r, 1]  # odd input rows 2i+1
        if last:
            nxt = jnp.concatenate(
                [x_ref[0, r0 + 1 : r0 + r, 0], jnp.zeros_like(r_e[:1])], axis=0
            )
        else:
            nxt = x_ref[0, r0 + 1 : r0 + r + 1, 0]
        taps = []
        zcol = None
        for dy_rows in (r_e, r_o, nxt):
            ev = dy_rows[:, :, :cin]  # col 2j   (dx=0)
            od = dy_rows[:, :, cin:]  # col 2j+1 (dx=1)
            if zcol is None:
                zcol = jnp.zeros_like(ev[:, :1])
            # col 2j+2 = even half of pair j+1; rightmost is SAME pad.
            taps.extend([ev, od, jnp.concatenate([ev[:, 1:], zcol], axis=1)])
        im2col = jnp.concatenate(taps, axis=-1).reshape(r * w2, 9 * cin)
        acc = jnp.dot(im2col, w, preferred_element_type=jnp.float32)
        y = acc * a + b  # (r*W2, Cout) * (1, Cout)
        y = jnp.where(y >= 0, y, y * slope)
        o_ref[0, r0 : r0 + r] = y.reshape(r, w2, -1).astype(o_ref.dtype)


def _pick_rows_per_chunk(h2: int, w2: int, k: int) -> int:
    """Largest divisor of h2 keeping the im2col chunk under ~1 MiB."""
    budget = 1 << 20
    best = 1
    for r in range(1, h2 + 1):
        if h2 % r:
            continue
        if r * w2 * k * 2 <= budget:
            best = r
    return best


@functools.partial(
    jax.jit, static_argnames=("negative_slope", "rows_per_chunk", "interpret")
)
def conv_down2_bn_leaky(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    epsilon: float = 1e-5,
    negative_slope: float = 0.1,
    rows_per_chunk: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """leaky_relu(batchnorm(conv_s2_3x3(x, kernel))) — fused, inference only.

    x: (B, H, W, Cin) with H, W even;  kernel: (3, 3, Cin, Cout);
    scale/bias/mean/var: (Cout,) BatchNorm parameters + running stats.
    Returns (B, H//2, W//2, Cout) in x.dtype.
    """
    btch, h, w, cin = x.shape
    cout = kernel.shape[-1]
    if h % 2 or w % 2:
        raise ValueError(f"H, W must be even, got {(h, w)}")
    h2, w2 = h // 2, w // 2

    # Folded BN affine in f32: y = conv*a + b.
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + epsilon)
    a = scale.astype(jnp.float32) * inv
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a

    # (3,3,Cin,Cout) -> (9*Cin, Cout); row-major (dy, dx, cin) order matches
    # the tap concat order in the kernel.
    w2d = kernel.reshape(9 * cin, cout).astype(x.dtype)

    # Free view: rows split by parity, column pairs packed into lanes.
    # (B, H, W, C) -> (B, H2, 2, W2, 2C) is a minor-dims-contiguous reshape.
    xp = x.reshape(btch, h2, 2, w2, 2 * cin)

    if rows_per_chunk is None:
        rows_per_chunk = _pick_rows_per_chunk(h2, w2, 9 * cin)
    elif h2 % rows_per_chunk:
        # The kernel loops h2 // rows_per_chunk chunks; a non-divisor would
        # leave the remainder output rows unwritten (uninitialized VMEM).
        raise ValueError(
            f"rows_per_chunk={rows_per_chunk} must divide H//2={h2}"
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel_pairview,
            rows_per_chunk=rows_per_chunk,
            slope=negative_slope,
        ),
        grid=(btch,),
        in_specs=[
            pl.BlockSpec(
                (1, h2, 2, w2, 2 * cin),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h2, w2, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((btch, h2, w2, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * btch * h2 * w2 * 9 * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize
            + btch * h2 * w2 * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w2d, a[None, :], b[None, :])
    return out


def conv_down2_bn_leaky_reference(
    x, kernel, scale, bias, mean, var, epsilon=1e-5, negative_slope=0.1
):
    """jnp oracle with identical semantics (XLA conv + folded affine)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(2, 2),
        padding=((0, 1), (0, 1)),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + epsilon)
    a = scale.astype(jnp.float32) * inv
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
    y = y * a + b
    y = jnp.where(y >= 0, y, y * negative_slope)
    return y.astype(x.dtype)
