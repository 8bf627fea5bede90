"""Platform/backend routing env flags must fail loudly on invalid values."""

import pytest


def test_invalid_nms_backend_env_rejected(monkeypatch):
    """A typo'd VIDDET_NMS_BACKEND must raise, not silently fall back (the
    flag exists for kernel-verification routing)."""
    from viddet_tpu.core.platform import default_nms_backend

    monkeypatch.setenv("VIDDET_NMS_BACKEND", "Pallas")
    with pytest.raises(ValueError, match="VIDDET_NMS_BACKEND"):
        default_nms_backend()


def test_invalid_conv_backend_env_rejected(monkeypatch):
    from viddet_tpu.core.platform import conv_backend, set_conv_backend

    set_conv_backend("auto")
    monkeypatch.setenv("VIDDET_CONV_BACKEND", "pallas-interpret")
    with pytest.raises(ValueError, match="VIDDET_CONV_BACKEND"):
        conv_backend()


def test_compilation_cache_writes_entries(tmp_path):
    """enable_compilation_cache must actually produce on-disk cache entries
    (repeat CLI invocations skip the model compile — cli/common.py)."""
    import jax
    import jax.numpy as jnp

    from viddet_tpu.cli.common import enable_compilation_cache

    d = str(tmp_path / "xla_cache")
    enable_compilation_cache(d)
    try:
        # tiny test program compiles in ms; force it under the threshold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        f = jax.jit(lambda x: jnp.sin(x) @ x.T)
        f(jnp.ones((32, 32))).block_until_ready()
        import os

        assert os.path.isdir(d) and len(os.listdir(d)) > 0
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
