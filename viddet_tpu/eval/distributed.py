"""Cross-process metric-state merging for multi-host sharded evaluation.

The reference evaluates on one node, so its metric objects are purely
local (SURVEY.md §4.2).  This repo's training already shards data per
process (data/loader.py shard=), and evaluation follows the same SPMD
recipe: every process evaluates a disjoint strided shard of the val set,
then the accumulated metric state is all-gathered over the job and merged
into one metric before ``get()``.

Transport: metric states are variable-length pickles, so we gather in two
rounds over ``jax.experimental.multihost_utils.process_allgather`` —
first the byte lengths, then the zero-padded byte buffers.  Both rides the
same ICI/DCN collectives as the training all-reduce; no side channel.
"""

from __future__ import annotations

import pickle
from typing import List


def gather_states(state: dict) -> List[dict]:
    """All-gather one picklable state dict per process, in process order.

    Single-process jobs short-circuit to ``[state]`` (no collective), so
    this is safe to call unconditionally from the eval CLI.
    """
    import jax

    if jax.process_count() == 1:
        return [state]

    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(state, protocol=4), np.uint8)
    # round 1: lengths (every process must call with the same shapes)
    lens = np.asarray(
        multihost_utils.process_allgather(np.asarray([blob.size], np.int64))
    ).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: blob.size] = blob
    # round 2: padded byte buffers, one row per process
    rows = np.asarray(multihost_utils.process_allgather(padded))
    rows = rows.reshape(len(lens), -1)
    return [
        pickle.loads(rows[p, : int(lens[p])].tobytes())
        for p in range(len(lens))
    ]


def merge_metric_states(metric, states: List[dict]):
    """Rebuild ``metric`` from per-process states, in process order.

    The metric is reset first so the local shard is not double-counted
    (its state is row ``process_index`` of ``states``).
    """
    metric.reset()
    for state in states:
        metric.merge_state(state)
    return metric
