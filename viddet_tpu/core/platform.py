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
    the jnp/XLA path on host CPU (where Pallas TPU kernels can't run).

    ``VIDDET_NMS_BACKEND`` overrides ("pallas" / "xla" /
    "pallas_interpret") — the interpret value drives the Pallas kernels
    through the CLIs on a CPU host (slow; verification only).
    """
    import os

    env = os.environ.get("VIDDET_NMS_BACKEND")
    if env:
        if env not in ("pallas", "xla", "pallas_interpret"):
            # This flag exists for kernel-verification routing — a typo'd
            # value silently running the default backend is a silent no-op
            # exactly where the user is trying to pin behavior.
            raise ValueError(
                f"VIDDET_NMS_BACKEND={env!r} is not one of "
                "'pallas' / 'xla' / 'pallas_interpret'"
            )
        return env
    return "xla" if get_platform() == "cpu" else "pallas"


_CONV_BACKEND: str | None = None


def set_conv_backend(backend: str) -> None:
    """Pin the ConvBNLeaky inference backend: "pallas", "xla",
    "pallas_interpret" (CPU tests), or "auto"."""
    global _CONV_BACKEND
    _CONV_BACKEND = None if backend == "auto" else backend


def conv_backend() -> str:
    """Backend for the fused stride-2 ConvBNLeaky inference kernel.

    Default is the XLA conv path; "pallas" (opt-in via ``set_conv_backend``
    or the ``VIDDET_CONV_BACKEND`` env var) routes the shallow downsample
    convs to the fused im2col kernel on TPU.
    """
    if _CONV_BACKEND is not None:
        return _CONV_BACKEND
    import os

    env = os.environ.get("VIDDET_CONV_BACKEND")
    if env:
        if env not in ("pallas", "xla", "pallas_interpret"):
            raise ValueError(
                f"VIDDET_CONV_BACKEND={env!r} is not one of "
                "'pallas' / 'xla' / 'pallas_interpret'"
            )
        return env
    return "xla"
