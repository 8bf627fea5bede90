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
