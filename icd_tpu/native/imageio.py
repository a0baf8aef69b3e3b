"""ctypes binding for the native JPEG decode+resize loader.

Lives in its own shared library (libicdimage.so) because it needs
libjpeg — environments without it keep the mask/JSON native features
and fall back to PIL for image loading (ImportError here is caught by
icd_tpu.data.dataset).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libicdimage.so")

subprocess.run(["make", "-C", _DIR, "libicdimage.so"],
               capture_output=True, text=True)
if not os.path.exists(_LIB_PATH):
    raise ImportError("libicdimage.so unavailable (libjpeg missing?)")
_lib = ctypes.CDLL(_LIB_PATH)

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
