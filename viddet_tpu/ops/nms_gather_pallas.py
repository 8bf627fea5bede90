"""Fused stage-1 gather + late box decode + pair scores as one Pallas kernel.

The YOLO inference tail between the stage-1 anchor top-k and the stage-2
(anchor, class) top-k is, in XLA, a chain of five ``take_along_axis``
gathers plus the big head-tensor concat/slices feeding them — ~4.5 ms of
pure data movement at batch 128 on v5e (profiled; docs/perf_notes.md).
This kernel replaces all of it with one pass per image:

* **Gather as a one-hot matmul.**  Mosaic has no general gather, but the
  MXU is idle here: ``onehot(idx) @ raw`` IS the gather, runs on the
  systolic array, and is exact — each output row is ``1.0 * value``.  One
  dot per FPN scale also merges the scales, so the (B, N, 5+C) head concat
  is never materialized (XLA dead-code-eliminates it).
* **Decode constants ride in the same dot.**  grid/anchor/stride are
  appended to the raw tensor as columns.  They must survive bf16: each
  f32 constant is split into an exact hi+lo bf16 pair (16 mantissa bits —
  exact for the integer grids/anchors/strides of every stock config; the
  split is verified with numpy at trace time and the caller falls back to
  the XLA path if it is not exact).
* The sigmoid/exp late decode and the ``obj * sigmoid(cls)`` pair scores
  run in the epilogue, so the kernel emits exactly the two tensors the
  stage-2 top-k needs.

Outputs are bit-identical to the XLA ``multiclass_nms_late_decode`` chain
(pinned by tests/unit/test_nms_gather_pallas.py and on-chip by
tools/tpu_parity_check.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scale_constants_np(h: int, w: int, anchors, stride: int) -> np.ndarray:
    """(N, 5) float32 [grid_x, grid_y, anchor_w, anchor_h, stride] in the
    head's (row, col, anchor) flattening order — numpy twin of
    ``models.yolo3._scale_constants``."""
    na = len(anchors)
    gx = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :, None], (h, w, na))
    gy = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None, None], (h, w, na))
    aw = np.broadcast_to(
        np.asarray(anchors, np.float32)[None, None, :, 0], (h, w, na)
    )
    ah = np.broadcast_to(
        np.asarray(anchors, np.float32)[None, None, :, 1], (h, w, na)
    )
    st = np.full((h, w, na), float(stride), np.float32)
    return np.stack([gx, gy, aw, ah, st], axis=-1).reshape(-1, 5)


def const_hilo_np(consts: np.ndarray) -> Tuple[np.ndarray, bool]:
    """Split (N, 5) f32 constants into an (N, 10) bf16 [hi | lo] matrix.

    Returns (hilo, exact): ``exact`` is True iff f32(hi) + f32(lo)
    reconstructs every constant bit-for-bit (16 mantissa bits suffice for
    all stock grids/anchors/strides).  Pure numpy (ml_dtypes) so it is
    safe to call while tracing an outer jit."""
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    hi = consts.astype(bf16)
    lo = (consts - hi.astype(np.float32)).astype(bf16)
    exact = bool(
        np.all(hi.astype(np.float32) + lo.astype(np.float32) == consts)
    )
    return np.concatenate([hi, lo], axis=-1), exact


def _make_kernel(sizes, k, d, cc):
    """Kernel over one image: gather+decode+score for ``len(sizes)`` scales."""

    n_scales = len(sizes)

    def kernel(*refs):
        raw_refs = refs[:n_scales]
        const_refs = refs[n_scales : 2 * n_scales]
        idx_ref = refs[2 * n_scales]
        ob_ref, op_ref = refs[2 * n_scales + 1 :]
        idx = idx_ref[0, 0]  # (K,) i32
        g = jnp.zeros((k, d + 10), jnp.float32)
        off = 0
        for rref, cref, ns in zip(raw_refs, const_refs, sizes):
            local = idx - off
            iota = jax.lax.broadcasted_iota(jnp.int32, (k, ns), 1)
            onehot = (iota == local[:, None]).astype(jnp.bfloat16)
            merged = jnp.concatenate([rref[0], cref[...]], axis=-1)
            g = g + jnp.dot(onehot, merged, preferred_element_type=jnp.float32)
            off += ns
        gc = g[:, d : d + 5] + g[:, d + 5 : d + 10]  # exact hi + lo
        # Identical float ops, in identical order, to the XLA late decode.
        xy = jax.nn.sigmoid(g[:, 0:2])
        wh = jnp.exp(g[:, 2:4])
        center = (xy + gc[:, 0:2]) * gc[:, 4:5]
        half = 0.5 * (wh * gc[:, 2:4])
        ob_ref[0] = jnp.concatenate([center - half, center + half], axis=-1)
        obj = jax.nn.sigmoid(g[:, 4:5])
        op_ref[0] = obj * jax.nn.sigmoid(g[:, 5:d])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_decode_pairs(
    raws: Sequence[jnp.ndarray],
    const_hilo: Sequence[jnp.ndarray],
    a_idx: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused per-scale gather -> late decode -> (boxes, pair scores).

    Args:
      raws: per-scale raw head tensors, each (B, Ni, 5+C), any float dtype
        (bf16 on the hot path).
      const_hilo: per-scale (Ni, 10) bf16 hi/lo decode constants
        (``const_hilo_np``).
      a_idx: (B, K) int32 stage-1 winner indices into the concatenated
        (deepest-first) anchor ordering.

    Returns:
      boxes  (B, K, 4) float32 decoded corner boxes,
      pairs  (B, K, C) float32 obj*cls scores.
    """
    b = raws[0].shape[0]
    d = raws[0].shape[-1]
    c = d - 5
    k = a_idx.shape[-1]
    sizes = tuple(r.shape[1] for r in raws)
    kernel = _make_kernel(sizes, k, d, c)

    in_specs = [
        pl.BlockSpec((1, ns, d), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM)
        for ns in sizes
    ]
    in_specs += [
        pl.BlockSpec((ns, 10), lambda ii: (0, 0), memory_space=pltpu.VMEM)
        for ns in sizes
    ]
    in_specs += [
        pl.BlockSpec((1, 1, k), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM)
    ]
    boxes, pairs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, k, 4), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, c), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, k, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * sum(sizes) * (d + 10),
            bytes_accessed=sum(r.size * r.dtype.itemsize for r in raws)
            + b * k * (4 + c) * 4,
            transcendentals=b * k * (c + 3),
        ),
        interpret=interpret,
    )(*raws, *const_hilo, a_idx.reshape(b, 1, k))
    return boxes, pairs
