"""ctypes binding for the native JSON validator (gason-equivalent)."""

import ctypes

from .mask import _lib  # reuse the shared library

_lib.icd_json_validate.restype = ctypes.c_int
_lib.icd_json_validate.argtypes = [
    ctypes.c_char_p, ctypes.c_uint64,
    ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_double)]


def validate(data):
    """Parse+validate a JSON document natively.

    Returns (valid, stats) where stats = {'nodes','objects','arrays',
    'strings','numbers','literals','numeric_sum'}.
    """
    if isinstance(data, str):
        data = data.encode()
    counts = (ctypes.c_uint64 * 6)()
    total = ctypes.c_double()
    ok = _lib.icd_json_validate(data, len(data), counts,
                                ctypes.byref(total))
    stats = {
        "nodes": counts[0], "objects": counts[1], "arrays": counts[2],
        "strings": counts[3], "numbers": counts[4], "literals": counts[5],
        "numeric_sum": total.value,
    }
    return bool(ok), stats
