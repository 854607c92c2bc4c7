"""ctypes bindings for the native C++ runtime (native/bf_native.cpp).

Builds on first use if the shared library is missing and a toolchain is
available; every entry point has a pure-Python fallback in io.event_file and
runtime.slice_buffer, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _EventArrays(ctypes.Structure):
    _fields_ = [
        ("t", ctypes.POINTER(ctypes.c_double)),
        ("x", ctypes.POINTER(ctypes.c_float)),
        ("y", ctypes.POINTER(ctypes.c_float)),
        ("p", ctypes.POINTER(ctypes.c_int8)),
        ("n", ctypes.c_int64),
    ]


def _find_or_build() -> Optional[ctypes.CDLL]:
    root = pathlib.Path(__file__).resolve().parents[2]
    so = root / "native" / "libbf_native.so"
    if not so.exists():
        try:
            import sys

            sys.path.insert(0, str(root / "native"))
            from build import build  # type: ignore

            build()
        except Exception:
            return None
        finally:
            sys.path.pop(0)
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.bf_parse_events.restype = ctypes.c_int64
    lib.bf_parse_events.argtypes = [ctypes.c_char_p, ctypes.POINTER(_EventArrays)]
    lib.bf_free_events.argtypes = [ctypes.POINTER(_EventArrays)]
    lib.bf_write_events_uv.restype = ctypes.c_int64
    lib.bf_write_events_uv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _find_or_build()
        except Exception:
            _LIB = None
    return _LIB


def parse_events(path: str) -> Optional[dict]:
    """Fast native parse of a 't x y p' recording; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    arrs = _EventArrays()
    n = lib.bf_parse_events(str(path).encode(), ctypes.byref(arrs))
    if n < 0:
        raise FileNotFoundError(path)
    try:
        t = np.ctypeslib.as_array(arrs.t, (n,)).copy()
        x = np.ctypeslib.as_array(arrs.x, (n,)).copy()
        y = np.ctypeslib.as_array(arrs.y, (n,)).copy()
        p = np.ctypeslib.as_array(arrs.p, (n,)).copy()
    finally:
        lib.bf_free_events(ctypes.byref(arrs))
    return {
        "x": x.astype(np.float64),
        "y": y.astype(np.float64),
        "t_ns": (1e9 * t).astype(np.int64),
        "polarity": p,
    }


def write_events_uv(path: str, x, y, t_ns, u, v, maxt: float = 0.0) -> Optional[int]:
    """Fast native writer; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    t_s = np.ascontiguousarray(np.asarray(t_ns, np.float64) / 1e9 + maxt)
    xf = np.ascontiguousarray(x, np.float32)
    yf = np.ascontiguousarray(y, np.float32)
    uf = np.ascontiguousarray(u, np.float32)
    vf = np.ascontiguousarray(v, np.float32)
    n = lib.bf_write_events_uv(
        str(path).encode(),
        t_s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        yf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(xf),
    )
    return int(n) if n >= 0 else None
