"""ctypes binding for the native JPEG decode+resize loader."""

import ctypes

import numpy as np

from .mask import _lib

_lib.icd_decode_resize_jpeg.restype = ctypes.c_int
_lib.icd_decode_resize_jpeg.argtypes = [
    ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
    ctypes.POINTER(ctypes.c_uint8)]


def decode_resize_jpeg(data, out_h, out_w):
    """JPEG bytes -> (out_h, out_w, 3) uint8 RGB, or None on failure.

    Uses libjpeg DCT scaling (decode at 1/2^k size) plus a
    PIL-compatible antialiased bilinear resize; releases the GIL, so a
    Python thread pool scales across cores.
    """
    out = np.empty((out_h, out_w, 3), np.uint8)
    ok = _lib.icd_decode_resize_jpeg(
        data, len(data), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if ok else None
