"""Training state, optimizer construction, checkpointing and weight export.

Reference behavior (SURVEY.md §5.3-5.4): ``net.save_parameters`` every
``save_interval`` epochs + ``_best.params`` on val-mAP improvement; optimizer
state is NOT saved (momentum restarts on resume — a known wart).  Rebuild:
Orbax checkpoints carry the FULL state (params + batch stats + optimizer +
step), fixing the wart, while a documented ``.npz`` weights-only schema
supports fixed-weight parity runs and GluonCV weight conversion.

``.npz`` schema: one entry per leaf, key = "/".join(pytree path) with two top
groups ``params/...`` and ``batch_stats/...``; values are float32 numpy
arrays in this repo's native layouts (conv kernels HWIO).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: float = 0.0,
    decay_epochs: Sequence[int] = (),
    decay_factor: float = 0.1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup + step decay — the reference's LR policy
    (``--lr-decay-epoch``/``--lr-decay``/``--warmup-epochs`` flags)."""
    warmup_steps = int(warmup_epochs * steps_per_epoch)
    boundaries = [int(e * steps_per_epoch) for e in decay_epochs]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        for b in boundaries:
            lr = jnp.where(step >= b, lr * decay_factor, lr)
        if warmup_steps > 0:
            warm = base_lr * (step + 1.0) / warmup_steps
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return schedule


def make_optimizer(
    lr_schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """SGD + momentum + (uniform) weight decay, the reference's trainer.

    MXNet applies wd to every parameter (incl. BN affine); we match.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr_schedule, momentum=momentum),
    )


# ---------------------------------------------------------------------------
# Weights-only .npz export / import (fixed-weight parity surface).
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_weights_npz(path: str, params, batch_stats) -> None:
    flat = _flatten({"params": jax.device_get(params)})
    flat.update(_flatten({"batch_stats": jax.device_get(batch_stats)}))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_weights_npz(path: str):
    """Returns (params, batch_stats) pytrees."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("batch_stats", {})


# ---------------------------------------------------------------------------
# Orbax full-state checkpoints (atomic, async-capable).
# ---------------------------------------------------------------------------


_CKPTR = None


def _checkpointer():
    """Process-wide Orbax checkpointer (its background write thread makes
    saves async; constructing one per save would serialize on setup)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(
    ckpt_dir: str, state: TrainState, step: int, block: bool = False
) -> None:
    """Save the full TrainState.  ASYNC by default: the device arrays are
    fetched to host here (so the caller may immediately mutate/donate the
    state) and the directory write runs on Orbax's background thread,
    hidden behind subsequent train steps.  The previous save is awaited
    first, bounding in-flight writes to one.  ``block=True`` waits for the
    write to land — the end-of-training and fault-injection paths, where
    the process is about to exit.  Saves are atomic either way (Orbax
    renames the finalized directory into place)."""
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr.save(
        path,
        {
            "step": jax.device_get(state.step),
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
        },
        force=True,
    )
    if block:
        ckptr.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if _CKPTR is not None:
        # an async save may still be finalizing its directory rename
        _CKPTR.wait_until_finished()
    if not os.path.isdir(ckpt_dir):
        return None
    # Match finalized directories only: an async save that died mid-write
    # leaves an Orbax temp dir (step_XXXXXXXX.orbax-checkpoint-tmp-*) that
    # startswith("step_") would pick up and hand to restore.  8+ digits and
    # a NUMERIC sort: save_checkpoint's {step:08d} grows past 8 digits for
    # step >= 1e8, where lexicographic ordering would mis-rank.
    steps = sorted(
        (d for d in os.listdir(ckpt_dir) if re.fullmatch(r"step_\d{8,}", d)),
        key=lambda d: int(d[5:]),
    )
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    if _CKPTR is not None:
        _CKPTR.wait_until_finished()  # in-process save->restore sequencing
    ckptr = ocp.StandardCheckpointer()
    target = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
