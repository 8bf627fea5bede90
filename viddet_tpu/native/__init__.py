"""ctypes bindings for the native host-decode library (decode.cpp).

Builds the shared library on first use (cached next to the source; rebuilt
when the source changes).  All entry points release the GIL for the whole
batch — the C++ thread pool provides the parallel decode the reference got
from forked DataLoader workers (SURVEY.md §3.2 N11).

Falls back gracefully: ``available()`` is False when the toolchain or
libjpeg/FFmpeg dev files are missing, and callers (data/loader.py,
infer/stream.py) use the cv2 path instead.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cpp")
_LIB_PATH = os.path.join(_DIR, "libviddet_decode.so")
_STAMP = os.path.join(_DIR, ".build_stamp")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _source_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    digest = _source_digest()
    if os.path.exists(_LIB_PATH) and os.path.exists(_STAMP):
        with open(_STAMP) as f:
            if f.read().strip() == digest:
                return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB_PATH,
        "-I/usr/include/x86_64-linux-gnu",
        "-ljpeg", "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
        "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed to launch: {e}"
    if proc.returncode != 0:
        return f"build failed:\n{proc.stderr[-2000:]}"
    with open(_STAMP, "w") as f:
        f.write(digest)
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    _build_error = _build()
    if _build_error is not None:
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vd_decode_jpeg_batch.restype = ctypes.c_int
    lib.vd_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.vd_decode_jpeg_batch_u8.restype = ctypes.c_int
    lib.vd_decode_jpeg_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.vd_video_open2.restype = ctypes.c_void_p
    lib.vd_video_open2.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vd_video_read.restype = ctypes.c_int64
    lib.vd_video_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vd_video_read_u8.restype = ctypes.c_int64
    lib.vd_video_read_u8.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vd_video_info.restype = None
    lib.vd_video_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
    ]
    lib.vd_video_close.restype = None
    lib.vd_video_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_jpeg_batch(
    paths,
    size: Tuple[int, int],
    letterbox: bool = True,
    pad_value: int = 128,
    num_threads: int = 0,
    normalize: bool = True,
):
    """Decode+preprocess a batch of JPEG files.

    Returns (images (N, h, w, 3), affines (N, 4), orig_sizes (N, 2) [h, w];
    failed decodes have orig size 0).  ``normalize=True`` emits ImageNet-
    normalized float32; ``normalize=False`` emits raw uint8 RGB for
    device-side normalization (1/4 the host->device bytes — pair with
    ``cli.common.make_predictor`` normalizes uint8 inputs in-graph).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decode unavailable: {_build_error}")
    h, w = size
    n = len(paths)
    affines = np.empty((n, 4), np.float32)
    orig = np.empty((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    common = (
        w, h, int(letterbox), pad_value,
        affines.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if normalize:
        out = np.empty((n, h, w, 3), np.float32)
        lib.vd_decode_jpeg_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            *common,
        )
    else:
        out = np.empty((n, h, w, 3), np.uint8)
        lib.vd_decode_jpeg_batch_u8(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            *common,
        )
    return out, affines, orig


class NativeVideoStream:
    """Streaming preprocessed frames from a video via the C++ decode thread."""

    def __init__(
        self,
        path: str,
        size: Tuple[int, int],
        letterbox: bool = True,
        pad_value: int = 128,
        every: int = 1,
        ring_capacity: int = 32,
        normalize: bool = True,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native decode unavailable: {_build_error}")
        self._lib = lib
        self._size = size
        self._normalize = normalize
        self._handle = lib.vd_video_open2(
            os.fsencode(path), size[1], size[0], int(letterbox), pad_value,
            every, ring_capacity, 0 if normalize else 1,
        )
        if not self._handle:
            raise FileNotFoundError(f"cannot open video: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.vd_video_info(self._handle, ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps))
        self.width, self.height, self.fps = w.value, h.value, fps.value

    def read(self):
        """-> (frame_index, image (h, w, 3) f32 normalized — or uint8 when
        constructed with ``normalize=False`` — affine (4,)) or None."""
        h, w = self._size
        affine = np.empty(4, np.float32)
        if self._normalize:
            out = np.empty((h, w, 3), np.float32)
            idx = self._lib.vd_video_read(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                affine.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        else:
            out = np.empty((h, w, 3), np.uint8)
            idx = self._lib.vd_video_read_u8(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                affine.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if idx < 0:
            return None
        return int(idx), out, affine

    def __iter__(self):
        while True:
            item = self.read()
            if item is None:
                return
            yield item

    def close(self):
        if self._handle:
            self._lib.vd_video_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
