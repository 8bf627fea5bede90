"""Jitted YOLOv3 train step — the rebuild of the reference's hot loop.

The reference's per-batch work (SURVEY.md §4.1): host-side split_and_load,
a Python loop over GPUs, forward + dynamic targets in-graph, backward, then
a KVStore gradient all-reduce.  Here the WHOLE thing is one
``train_step(state, batch) -> (state, metrics)`` XLA program:

* the batch arrives sharded over the ``data`` mesh axis (parallel/mesh.py);
* parameters/optimizer state are replicated; XLA (GSPMD) inserts the
  gradient all-reduce over ICI automatically because the loss reduces over
  the sharded batch axis — no NCCL/KVStore equivalent to manage;
* BatchNorm batch statistics reduce over the *global* batch under GSPMD,
  i.e. SyncBatchNorm semantics by construction (a strict upgrade over the
  reference's optional ``--syncbn``);
* target assignment (prefetch + dynamic) happens in-step (train/targets.py);
* ``donate_argnums`` recycles the state buffers in HBM.

Multi-scale training: the reference re-randomizes input size 320-608 every
10 batches; XLA needs static shapes, so the loader cycles through a fixed
bucket list and this step function is compiled once per bucket (bounded
compile cost, same regularization — SURVEY.md §8 hard part 3).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from viddet_tpu.train.losses import yolo_loss
from viddet_tpu.train.state import TrainState



def _maybe_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Normalize uint8 batches in-graph; pass float batches through.

    The loader's device-normalize path (``TrainTransform(normalize=False)``)
    ships raw uint8 batches — 4x smaller host->device transfers and one
    fewer full-image float pass per sample on the host.  The dtype check is
    trace-time (one executable per input dtype), and the f32 expression
    matches ``data.transforms.normalize`` within 1 ulp (XLA may rewrite
    /255 as a reciprocal multiply).
    """
    if images.dtype == jnp.uint8:
        from viddet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        images = (
            images.astype(jnp.float32) / 255.0 - jnp.asarray(IMAGENET_MEAN)
        ) / jnp.asarray(IMAGENET_STD)
    return images


def make_train_step(
    module,
    *,
    strides,
    anchors,
    num_classes: int,
    ignore_thresh: float = 0.7,
    label_smooth: bool = False,
):
    """Returns jitted ``train_step(state, images, gt_boxes, gt_ids, gt_weights)``.

    One compiled executable per distinct image shape (multi-scale buckets).
    """

    def loss_fn(params, batch_stats, images, gt_boxes, gt_ids, gt_weights):
        images = _maybe_normalize(images)
        outputs, mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        losses = yolo_loss(
            outputs,
            gt_boxes,
            gt_ids,
            gt_weights,
            # works for images [B,H,W,3] and clips [B,k,H,W,3]
            image_size=(images.shape[-3], images.shape[-2]),
            strides=strides,
            anchors=anchors,
            num_classes=num_classes,
            ignore_thresh=ignore_thresh,
            label_smooth=label_smooth,
        )
        return losses["total"], (losses, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_ids: jnp.ndarray,
        gt_weights: jnp.ndarray | None = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        grads, (losses, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params,
            state.batch_stats,
            images,
            gt_boxes,
            gt_ids,
            gt_weights,
        )
        new_state = state.apply_gradients(grads, new_batch_stats)
        return new_state, losses

    return train_step


def make_ssd_train_step(module):
    """Jitted SSD train step (softmax CE + OHEM + SmoothL1, in-step targets)."""
    from viddet_tpu.models.ssd import ssd_loss

    def loss_fn(params, batch_stats, images, gt_boxes, gt_ids):
        images = _maybe_normalize(images)
        outputs, mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        losses = ssd_loss(outputs, gt_boxes, gt_ids)
        return losses["total"], (losses, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, gt_boxes, gt_ids):
        grads, (losses, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, gt_boxes, gt_ids
        )
        new_state = state.apply_gradients(grads, new_batch_stats)
        return new_state, losses

    return train_step


def make_frcnn_train_step(module):
    """Jitted Faster R-CNN train step: RPN + head losses, in-graph sampling.

    Signature: ``train_step(state, rng, images, gt_boxes, gt_ids)`` — the rng
    drives RPN/ROI minibatch sampling (split per step by the caller).
    """
    from viddet_tpu.models.faster_rcnn import frcnn_loss

    cfg = module.config

    def loss_fn(params, batch_stats, rng, images, gt_boxes, gt_ids):
        images = _maybe_normalize(images)
        sample_rng, target_rng = jax.random.split(rng)
        outputs, mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            gt_boxes,
            gt_ids,
            train=True,
            mutable=["batch_stats"],
            rngs={"sampling": sample_rng},
        )
        losses = frcnn_loss(outputs, gt_boxes, gt_ids, cfg, target_rng)
        return losses["total"], (losses, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, rng, images, gt_boxes, gt_ids):
        grads, (losses, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, rng, images, gt_boxes, gt_ids
        )
        new_state = state.apply_gradients(grads, new_batch_stats)
        return new_state, losses

    return train_step


def make_eval_step(module, nms_config=None):
    """Jitted ``eval_step(params, batch_stats, images) -> (ids, scores, boxes)``."""
    from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess

    nms = nms_config or NMSConfig()

    @jax.jit
    def eval_step(params, batch_stats, images):
        return forward_and_postprocess(
            module,
            {"params": params, "batch_stats": batch_stats},
            _maybe_normalize(images),
            nms,
        )

    return eval_step
