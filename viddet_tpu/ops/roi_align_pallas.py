"""Pallas TPU ROIAlign over an FPN pyramid (SURVEY.md §3.2 N5).

TPU-native design (NOT a port of the CUDA scalar kernel): one grid step per
roi.  The roi's assigned level is known host-side (FPN eq. 1 is a cheap
vectorized computation), so each step DMAs a fixed-size WINDOW x WINDOW cell
neighbourhood of the roi from the packed pyramid in HBM into VMEM
(double-buffered across rois), builds the two separable bilinear weight
matrices on the VPU, and reduces the window with two MXU matmuls:

    out[p, q, c] = sum_{y, x} WY[p, y] * WX[q, x] * tile[y, x, c]

Bilinear interpolation *and* the SxS-per-bin averaging both fold into
WY/WX (each row is the mean of S two-nonzero bilinear stencils), so the
kernel does zero gather work — the only dynamic indexing is the window DMA
origin.  Out-of-level samples get zero weight, which makes reads of the
inter-level padding rows harmless.

Exactness domain: identical to ops/roi_align.multilevel_roi_align_packed
(the jnp oracle) for every roi whose per-axis extent on its assigned level
is < WINDOW cells.  With the standard FPN assignment (k0=4, canonical 224)
a roi's sqrt-area extent is < 28 cells, so WINDOW=48 is exact up to ~2.9:1
aspect ratio at the top of a level's size band (and for ALL aspect ratios
elsewhere); beyond that the window clips the roi's outermost samples.
Verified against the oracle in interpret mode (tests/unit/test_roi_align.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viddet_tpu.ops.roi_align import fpn_roi_level

WINDOW = 48  # cells per window side; see exactness note above
N_BUF = 2    # double buffering


def _kernel(p, s):
    """Returns the kernel body for output_size=p, sampling_ratio=s."""
    n = p * s

    def weights(start, bin_sz, extent, origin):
        """(P, WINDOW) f32: separable bilinear+avg weights for one axis.

        start/bin_sz: roi start & bin size in level cells; extent: level
        size along this axis; origin: window origin (level-local cells).
        """
        g = (jax.lax.broadcasted_iota(jnp.float32, (n, 1), 0) + 0.5) / s
        coord = start + g * bin_sz                       # (n, 1) sample coords
        valid = (coord > -1.0) & (coord < extent)
        c = jnp.clip(coord, 0.0, extent - 1.0)
        c0 = jnp.floor(c)
        frac = c - c0
        i0 = c0.astype(jnp.int32) - origin               # window-local cells
        i1 = jnp.minimum(c0 + 1.0, extent - 1.0).astype(jnp.int32) - origin
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, WINDOW), 1)
        w = jnp.where(lane == i0, 1.0 - frac, 0.0) + jnp.where(
            lane == i1, frac, 0.0
        )
        w = jnp.where(valid, w, 0.0)
        return w.reshape(p, s, WINDOW).mean(axis=1)      # fold bin averaging

    def kernel(origins_ref, params_ref, feat_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        r_total = pl.num_programs(0)

        def window_dma(slot, r):
            return pltpu.make_async_copy(
                feat_ref.at[
                    pl.ds(origins_ref[r, 0], WINDOW),
                    pl.ds(origins_ref[r, 1], WINDOW),
                    slice(None),
                ],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(i + 1 < r_total)
        def _():
            window_dma((i + 1) % N_BUF, i + 1).start()

        window_dma(i % N_BUF, i).wait()

        prm = params_ref[0]  # (8,) f32
        wy = weights(prm[0], prm[2], prm[4], prm[6])     # (p, WINDOW)
        wx = weights(prm[1], prm[3], prm[5], prm[7])

        c = scratch.shape[-1]
        tile = scratch[i % N_BUF].astype(jnp.float32)    # (W, W, C)
        # y-contraction on the MXU: (p, W) @ (W, W*C)
        t1 = jnp.dot(
            wy, tile.reshape(WINDOW, WINDOW * c),
            preferred_element_type=jnp.float32,
        ).reshape(p, WINDOW, c)
        # x-contraction: move the window-x axis to the front, then
        # (p, W) @ (W, p*C) on the MXU
        t1 = t1.transpose(1, 0, 2).reshape(WINDOW, p * c)
        t2 = jnp.dot(wx, t1, preferred_element_type=jnp.float32)  # (q, p*C)
        out = t2.reshape(p, p, c).swapaxes(0, 1)         # -> (p_y, q_x, C)
        out_ref[0] = out.reshape(p * p, c)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "k_min",
                     "interpret"),
)
def multilevel_roi_align_pallas(
    pyramid: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    k_min: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched FPN ROIAlign: pyramid of (B, H_l, W_l, C), rois (B, R, 4)
    image-coordinate corners -> (B, R, P, P, C) float32.

    Drop-in for ``jax.vmap(multilevel_roi_align_packed)`` (same semantics on
    the exactness domain in the module docstring).
    """
    p, s = output_size, sampling_ratio
    b, r = rois.shape[0], rois.shape[1]
    c = pyramid[0].shape[-1]
    hs = [int(f.shape[1]) for f in pyramid]
    ws = [int(f.shape[2]) for f in pyramid]
    wpad = max(max(ws), WINDOW)

    # Pack: per batch element, levels stacked along rows (W padded), plus
    # WINDOW guard rows so the last level's window never reads out of bounds.
    packed = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
         for f, w in zip(pyramid, ws)]
        + [jnp.zeros((b, WINDOW, wpad, c), pyramid[0].dtype)],
        axis=1,
    )
    rows_per_batch = packed.shape[1]
    packed = packed.reshape(b * rows_per_batch, wpad, c)
    row_off = jnp.asarray(
        [sum(hs[:i]) for i in range(len(hs))], jnp.int32
    )

    # Per-roi prep (vectorized): level, start/bin in level cells, origins.
    flat_rois = rois.reshape(b * r, 4)
    lvl = fpn_roi_level(flat_rois, k_min=k_min,
                        k_max=k_min + len(pyramid) - 1) - k_min
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]
    h_l = jnp.asarray(hs, jnp.int32)[lvl]
    w_l = jnp.asarray(ws, jnp.int32)[lvl]
    boxes = flat_rois * scale[:, None]
    y_start, x_start = boxes[:, 1], boxes[:, 0]
    bin_h = jnp.maximum(boxes[:, 3] - y_start, 1e-3) / p
    bin_w = jnp.maximum(boxes[:, 2] - x_start, 1e-3) / p
    oy = jnp.clip(
        jnp.floor(y_start).astype(jnp.int32), 0, jnp.maximum(h_l - WINDOW, 0)
    )
    ox = jnp.clip(
        jnp.floor(x_start).astype(jnp.int32), 0, jnp.maximum(w_l - WINDOW, 0)
    )
    batch_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, r), 0).reshape(-1)
    )
    origins = jnp.stack(
        [batch_idx * rows_per_batch + row_off[lvl] + oy, ox], axis=1
    )  # (B*R, 2) int32
    params = jnp.stack(
        [
            y_start, x_start, bin_h, bin_w,
            h_l.astype(jnp.float32), w_l.astype(jnp.float32),
            oy.astype(jnp.float32), ox.astype(jnp.float32),
        ],
        axis=1,
    )  # (B*R, 8) f32

    out = pl.pallas_call(
        _kernel(p, s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * r,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i, o: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, p * p, c), lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, WINDOW, WINDOW, c), packed.dtype),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * r, p * p, c), jnp.float32),
        interpret=interpret,
    )(origins, params, packed)
    return out.reshape(b, r, p, p, c)


def multilevel_roi_align_auto(
    pyramid_batched: List[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    k_min: int = 2,
    backend: str = "xla",
) -> jnp.ndarray:
    """Backend dispatch: 'xla' = vmapped packed-gather oracle,
    'pallas' = TPU kernel, 'pallas_interpret' = kernel in interpreter mode."""
    if backend in ("pallas", "pallas_interpret"):
        return multilevel_roi_align_pallas(
            pyramid_batched, rois, tuple(strides), output_size,
            sampling_ratio, k_min, interpret=(backend == "pallas_interpret"),
        )
    from viddet_tpu.ops.roi_align import multilevel_roi_align_packed

    return jax.vmap(
        lambda maps, boxes: multilevel_roi_align_packed(
            maps, boxes, strides=strides, output_size=output_size,
            sampling_ratio=sampling_ratio, k_min=k_min,
        ),
        in_axes=(0, 0),
    )(pyramid_batched, rois)
