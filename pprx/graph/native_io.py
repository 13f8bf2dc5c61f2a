"""ctypes bridge to the native C++ edge-list parser (native/edgeio.cpp).

Loads ``libpprx_edgeio.so`` if it has been built (``make -C native``);
otherwise ``AVAILABLE`` is False and callers fall back to the pure-Python
parser in pprx.graph.io (same output contract, property-tested against each
other in tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libpprx_edgeio.so",
)

_lib = None
if os.path.exists(_LIB_PATH) and os.environ.get("PPRX_NO_NATIVE", "0") != "1":
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.pprx_parse_edgelist.restype = ctypes.c_int
        _lib.pprx_parse_edgelist.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib.pprx_free.restype = None
        _lib.pprx_free.argtypes = [ctypes.c_void_p]
    except OSError:
        _lib = None

AVAILABLE = _lib is not None


def parse_edgelist_raw(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Parse via the native library. Returns (src, dst, ts, has_ts) in FILE
    ORDER, un-renumbered. Raises RuntimeError if unavailable or on IO error.
    """
    if _lib is None:
        raise RuntimeError("native edge IO library not built (make -C native)")
    src_p = ctypes.POINTER(ctypes.c_int64)()
    dst_p = ctypes.POINTER(ctypes.c_int64)()
    ts_p = ctypes.POINTER(ctypes.c_double)()
    count = ctypes.c_int64()
    has_ts = ctypes.c_int()
    rc = _lib.pprx_parse_edgelist(
        path.encode(), ctypes.byref(src_p), ctypes.byref(dst_p),
        ctypes.byref(ts_p), ctypes.byref(count), ctypes.byref(has_ts),
    )
    if rc != 0:
        raise RuntimeError(f"native edge parse failed (rc={rc}) for {path!r}")
    n = count.value
    try:
        if n == 0:
            return (
                np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), bool(has_ts.value),
            )
        src = np.ctypeslib.as_array(src_p, shape=(n,)).copy()
        dst = np.ctypeslib.as_array(dst_p, shape=(n,)).copy()
        ts = np.ctypeslib.as_array(ts_p, shape=(n,)).copy()
    finally:
        if n > 0:
            _lib.pprx_free(src_p)
            _lib.pprx_free(dst_p)
            _lib.pprx_free(ts_p)
    return src, dst, ts, bool(has_ts.value)
