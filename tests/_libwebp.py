"""Test-only ctypes bridge to the system libwebp reference codec.

Gives the VP8/WebP tests a GROUND-TRUTH decoder: frames produced by
``ops/vp8.encode_*`` are decoded by Google's reference implementation
and compared plane-by-plane against ``ops/vp8.decode_vp8_frame`` —
cross-validating the boolean coder, header layout, token trees,
probability tables, dequant, inverse transforms, prediction, and loop
filter against real-world VP8, not just our own round-trip. Tests skip
cleanly when the library is absent (it is NOT a runtime dependency —
the production decode path stays pure numpy/stdlib).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_LIB_NAMES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib")


def load_libwebp():
    for name in _LIB_NAMES:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def reference_decode_yuv(
    webp_bytes: bytes,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(y, u, v) uint8 planes of a WebP file decoded by libwebp, or
    None when the library is unavailable. Raises ValueError when the
    library rejects the bitstream (that IS a test signal: our encoder
    emitted something the reference codec refuses)."""
    lib = load_libwebp()
    if lib is None:
        return None
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]

    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        webp_bytes, len(webp_bytes),
        ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise ValueError("libwebp rejected the bitstream")
    try:
        W, H, S, US = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        y = np.ctypeslib.as_array(yp, shape=(H, S))[:, :W].copy()
        u = np.ctypeslib.as_array(up, shape=(ch, US))[:, :cw].copy()
        v = np.ctypeslib.as_array(vp, shape=(ch, US))[:, :cw].copy()
        return y, u, v
    finally:
        lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))


def wrap_vp8_container(frame: bytes) -> bytes:
    """RIFF/WEBP container around a raw 'VP8 ' chunk payload."""
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body
