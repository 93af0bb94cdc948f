"""ctypes loader for the native setup kernels (compile-on-first-use).

The shared object is built with g++ next to the source and cached; any
failure (no compiler, sandboxed FS) degrades gracefully to the pure-Python
kernels — correctness never depends on the native tier.  Set
``AMGTPU_NO_NATIVE=1`` to force the Python tier (used by conformance tests
to exercise both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_SRC = _HERE / "amg_setup.cpp"
_SO = _HERE / "_amg_setup.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_native() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    if os.environ.get("AMGTPU_NO_NATIVE") == "1":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                if not _compile():
                    return None
            lib = ctypes.CDLL(str(_SO))
            i64p = ctypes.POINTER(ctypes.c_int64)
            f64p = ctypes.POINTER(ctypes.c_double)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.rs_cf_splitting.argtypes = [ctypes.c_int64, i64p, i64p, i64p, i64p, i64p]
            lib.rs_cf_splitting.restype = None
            lib.standard_aggregation.argtypes = [ctypes.c_int64, i64p, i64p, f64p, i64p]
            lib.standard_aggregation.restype = ctypes.c_int64
            lib.greedy_coloring.argtypes = [ctypes.c_int64, i64p, i64p, i32p]
            lib.greedy_coloring.restype = ctypes.c_int32
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def as_i64_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def as_f64_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def as_i32_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
