"""Single cached platform resolution.

Config/trace paths must never call ``jax.devices()`` directly: every call
re-touches backend initialization, and in a degraded environment (TPU tunnel
down) that blocks forever — the round-1 dryrun failure class.  Resolve the
platform ONCE here, cache it, and let every NMS/ROI backend choice read the
cache.  ``set_platform`` lets CLIs/tests pin it without any device query.
"""

from __future__ import annotations

import jax

_PLATFORM: str | None = None


def set_platform(platform: str) -> None:
    """Pin the platform (e.g. from a CLI at startup or a test fixture)."""
    global _PLATFORM
    _PLATFORM = platform


def get_platform() -> str:
    """The default backend's platform name, resolved once per process."""
    global _PLATFORM
    if _PLATFORM is None:
        _PLATFORM = jax.default_backend()
    return _PLATFORM


def default_nms_backend() -> str:
    """Kernel choice for in-graph NMS/ROI ops: Pallas on real accelerators,
    the jnp/XLA path on host CPU (where Pallas TPU kernels can't run)."""
    return "xla" if get_platform() == "cpu" else "pallas"
