"""initialize_distributed hardening (VERDICT r2 weak #5).

The reference's multi-host role is MXNet's `dist_sync` KVStore
(SURVEY.md §5.8); the rebuild's equivalent is jax.distributed + GSPMD.
A misconfigured coordinator must RAISE, not silently degrade to
single-host SPMD; a second init and a plain single-process environment
must be clean no-ops.
"""

import logging

import pytest

from viddet_tpu.parallel.mesh import initialize_distributed


def test_single_process_noop(caplog):
    # No coordinator requested and none in the environment: must return
    # cleanly (jax.distributed has nothing to do on one process).
    with caplog.at_level(logging.INFO, logger="viddet_tpu.parallel"):
        initialize_distributed()
    # And must be callable again without raising.
    initialize_distributed()


def test_explicit_bad_coordinator_raises():
    import jax

    if jax.distributed.is_initialized():  # pragma: no cover - env dependent
        pytest.skip("jax.distributed already initialized in this process")
    with pytest.raises(RuntimeError, match="refusing to fall back"):
        # Explicit coordinator with inconsistent/garbage settings must not
        # be swallowed.  num_processes=2 with an unreachable coordinator
        # fails fast inside jax.distributed.initialize (invalid address).
        initialize_distributed(
            coordinator_address="256.256.256.256:0",
            num_processes=-3,
            process_id=0,
        )


def test_cluster_marker_failure_raises(monkeypatch):
    # A cluster marker in the environment means an auto-detect init failure
    # is a REAL pod failure: re-raise, never degrade to single-host SPMD.
    import jax

    if jax.distributed.is_initialized():  # pragma: no cover - env dependent
        pytest.skip("jax.distributed already initialized in this process")
    monkeypatch.setenv("SLURM_NTASKS", "4")

    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="refusing to fall back"):
        initialize_distributed()
