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

WINDOW = 48    # cells per window side (rows); see exactness note above
WINDOW_X = 56  # column window: WINDOW + 8 slack so the DMA column origin
               # can be aligned down to the sublane tiling (Mosaic requires
               # dynamic slice starts on the tiled row dim to be 8-aligned)
N_BUF = 2      # double buffering


def _kernel(p, s):
    """Returns the kernel body for output_size=p, sampling_ratio=s."""
    n = p * s

    def weights(start, bin_sz, extent, origin, win):
        """(P, win) f32: separable bilinear+avg weights for one axis.

        start/bin_sz: roi start & bin size in level cells; extent: level
        size along this axis; origin: window origin (level-local cells).
        """
        # One (p, win) pass per sample offset, summed — stays at the output
        # shape throughout (no strided slicing / sublane regroups, which
        # Mosaic rejects).  Integer iota + cast: tpu.iota is int-only.
        bin_i = jax.lax.broadcasted_iota(jnp.int32, (p, win), 0).astype(
            jnp.float32
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (p, win), 1)
        acc = jnp.zeros((p, win), jnp.float32)
        for t in range(s):
            g = bin_i + (t + 0.5) / s
            coord = start + g * bin_sz        # (p, win), const along lanes
            valid = (coord > -1.0) & (coord < extent)
            c = jnp.clip(coord, 0.0, extent - 1.0)
            c0 = jnp.floor(c)
            frac = c - c0
            i0 = c0.astype(jnp.int32) - origin           # window-local cells
            i1 = (
                jnp.minimum(c0 + 1.0, extent - 1.0).astype(jnp.int32) - origin
            )
            w = jnp.where(lane == i0, 1.0 - frac, 0.0) + jnp.where(
                lane == i1, frac, 0.0
            )
            acc = acc + jnp.where(valid, w, 0.0)
        return acc * (1.0 / s)                            # (p, win)

    def kernel(origins_ref, params_ref, feat_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        r_total = pl.num_programs(0)

        def window_dma(slot, r):
            return pltpu.make_async_copy(
                feat_ref.at[
                    pl.ds(origins_ref[2 * r], WINDOW),
                    # The host aligns column origins to the sublane tiling;
                    # multiple_of lets Mosaic prove it.
                    pl.ds(pl.multiple_of(origins_ref[2 * r + 1], 8), WINDOW_X),
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

        prm = params_ref[0, 0]  # (8,) f32
        wy = weights(prm[0], prm[2], prm[4], prm[6], WINDOW)    # (p, W)
        wx = weights(prm[1], prm[3], prm[5], prm[7], WINDOW_X)  # (p, Wx)

        c = scratch.shape[-1]
        tile = scratch[i % N_BUF].astype(jnp.float32)    # (W, Wx, C)
        # Separable contractions on the MXU with multi-dim dot_general
        # operands (keeps every intermediate at its natural rank — Mosaic
        # rejects the sublane->lane reshapes a 2-D matmul formulation
        # would need).  HIGHEST so the f32 products stay exact.
        t1 = jax.lax.dot_general(
            wy,
            tile,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (p_y, Wx, C)
        t2 = jax.lax.dot_general(
            wx,
            t1,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (p_x, p_y, C)
        for iy in range(p):
            out_ref[0, iy * p : (iy + 1) * p] = t2[:, iy, :]  # row-major

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
    # Column padding: room for the 8-aligned window origin + WINDOW_X cols,
    # rounded up to the sublane tiling.
    wpad = -(-(max(max(ws) + 8, WINDOW_X)) // 8) * 8

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
    ox = (ox // 8) * 8  # Mosaic: dynamic starts on the tiled row dim
    batch_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, r), 0).reshape(-1)
    )
    # Flat (B*R*2,) [row, col] pairs: SMEM scalar-prefetch operands pad the
    # minor dim of 2-D arrays to the lane width (2400x2 would become 1.2 MB).
    origins = jnp.stack(
        [batch_idx * rows_per_batch + row_off[lvl] + oy, ox], axis=1
    ).reshape(-1)  # (B*R*2,) int32
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
                # (1, 1, 8) over (B*R, 1, 8): the last two block dims must
                # equal the array dims (Mosaic divisibility rule).
                pl.BlockSpec((1, 1, 8), lambda i, o: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, p * p, c), lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, WINDOW, WINDOW_X, c), packed.dtype),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * r, p * p, c), jnp.float32),
        interpret=interpret,
    )(origins, params[:, None, :], packed)
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
