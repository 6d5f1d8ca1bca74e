"""ctypes bindings for the native host-ops library (native/host_ops.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to
the source. All callers degrade gracefully to the numpy/PIL path when a
toolchain is unavailable, so the framework never hard-depends on the
native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "host_ops.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhost_ops.so")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC
    ):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _LIB_PATH, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        # retry without libjpeg (header/lib missing on some hosts):
        # the decode entry point then reports unavailable and callers
        # use the PIL decode path
        try:
            subprocess.run(
                cmd[:-1] + ["-DHOST_OPS_NO_JPEG"],
                check=True, capture_output=True, timeout=120,
            )
            return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            return None


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            path = _build()
            if path is not None:
                lib = ctypes.CDLL(path)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                lib.resize_normalize_u8_to_f32.argtypes = [
                    u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ]
                lib.batch_resize_normalize_u8_to_f32.argtypes = [
                    ctypes.POINTER(u8p),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                try:
                    lib.resample_u8_to_u8.argtypes = [
                        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        u8p, ctypes.c_int, ctypes.c_int,
                    ]
                except AttributeError:
                    pass  # stale pre-u8 build; callers fall back to PIL
                try:
                    lib.decode_jpeg_resize_normalize.argtypes = [
                        u8p, ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ]
                    lib.decode_jpeg_resize_normalize.restype = ctypes.c_int
                    lib.decode_jpeg_resize_u8.argtypes = [
                        u8p, ctypes.c_int64, u8p,
                        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ]
                    lib.decode_jpeg_resize_u8.restype = ctypes.c_int
                except AttributeError:
                    pass
                _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def decode_jpeg_resize_normalize(
    data: bytes, size: int, channels: int = 3, fast_dct: bool = False
) -> np.ndarray | None:
    """JPEG bytes -> float32 (size, size, C) in [-1, 1], fully in C++
    (decode + antialiased resample + normalize; the ctypes call releases
    the GIL so loader threads scale across host cores). ``fast_dct``
    enables DCT-domain scaled decode (~3-4x faster for COCO 640px ->
    256px; slightly different but still antialiased pixels). Returns
    None when the decode fails or the library lacks libjpeg — callers
    fall back to PIL."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "decode_jpeg_resize_normalize"):
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((size, size, channels), np.float32)
    rc = lib.decode_jpeg_resize_normalize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size, channels, int(fast_dct),
    )
    return out if rc == 0 else None


def decode_jpeg_resize_u8(
    data: bytes, size: int, channels: int = 3, fast_dct: bool = False
) -> np.ndarray | None:
    """JPEG bytes -> uint8 (size, size, C) resampled WITHOUT normalize —
    the device-normalize transfer path (4x fewer H2D bytes; the step
    normalizes on-device). The u8 rounding after the triangle resample
    uses PIL's u8-output convention ((int)(v + 0.5), clamped); note the
    reference itself resamples float tensors (ToTensor before Resize,
    /root/reference/train.py:40-48) — the quantization here is a
    deliberate transfer-width trade, not reference parity. Returns None
    on decode failure or a library without libjpeg/the u8 symbol."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "decode_jpeg_resize_u8"):
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((size, size, channels), np.uint8)
    rc = lib.decode_jpeg_resize_u8(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, size, channels, int(fast_dct),
    )
    return out if rc == 0 else None


def resize_u8(img_u8: np.ndarray, size: int) -> np.ndarray | None:
    """uint8 HWC -> uint8 (size, size, C), antialiased triangle resample
    with PIL's u8 rounding. None when the loaded library predates the
    u8 entry points (callers fall back to PIL)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "resample_u8_to_u8"):
        return None
    img_u8 = np.ascontiguousarray(img_u8)
    h, w, c = img_u8.shape
    out = np.empty((size, size, c), np.uint8)
    lib.resample_u8_to_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, size,
    )
    return out


def resize_normalize(img_u8: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> float32 (size, size, C) in [-1, 1] (antialiased
    triangle resample, PIL BILINEAR semantics)."""
    lib = get_lib()
    assert lib is not None, "native host_ops unavailable"
    img_u8 = np.ascontiguousarray(img_u8)
    h, w, c = img_u8.shape
    out = np.empty((size, size, c), np.float32)
    lib.resize_normalize_u8_to_f32(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size,
    )
    return out


def batch_resize_normalize(
    imgs_u8: list[np.ndarray], size: int, num_threads: int = 8
) -> np.ndarray:
    """List of uint8 HWC images -> one (N, size, size, C) float32 batch."""
    lib = get_lib()
    assert lib is not None, "native host_ops unavailable"
    imgs_u8 = [np.ascontiguousarray(im) for im in imgs_u8]
    n = len(imgs_u8)
    c = imgs_u8[0].shape[2]
    out = np.empty((n, size, size, c), np.float32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * n)(*[im.ctypes.data_as(u8p) for im in imgs_u8])
    shs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs_u8])
    sws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs_u8])
    lib.batch_resize_normalize_u8_to_f32(
        ptrs, shs, sws, c, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size, num_threads,
    )
    return out
