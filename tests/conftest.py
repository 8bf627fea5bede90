"""Test configuration: run everything on 8 virtual CPU devices.

This is the TPU-world "fake backend" (SURVEY.md §6): distributed logic
(mesh sharding, gradient all-reduce, SyncBN) is exercised on host CPU with
``--xla_force_host_platform_device_count=8`` so tests need no TPU pod.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# Override unconditionally: the environment exports JAX_PLATFORMS=axon (the
# real TPU); tests must run on the fake multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pytest plugins (jaxtyping) import jax BEFORE this conftest runs, so jax has
# already latched JAX_PLATFORMS=axon into its config; the backend itself is
# still uninitialized at conftest time, so updating the config works.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
