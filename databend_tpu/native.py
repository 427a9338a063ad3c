"""ctypes loader for the native (C++) runtime pieces.

The shared library is built from native/ with `make` (g++); if it is
missing we build it on first use, and if no toolchain is available every
caller falls back to the pure-Python path — the native layer is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdbtpu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dbtpu_csv_count.restype = ctypes.c_int
        lib.dbtpu_csv_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_char,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.dbtpu_csv_scan.restype = ctypes.c_int
        lib.dbtpu_csv_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_char,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def csv_scan(data: bytes, delim: str = ",", quote: str = '"'):
    """Tokenize a CSV buffer natively.

    Returns (starts, lens, quoted, row_ends) int64/uint8 numpy arrays, or
    None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(data)
    rows = ctypes.c_int64(0)
    fields = ctypes.c_int64(0)
    rc = lib.dbtpu_csv_count(data, n, delim.encode()[0:1], quote.encode()[0:1],
                             ctypes.byref(rows), ctypes.byref(fields))
    if rc != 0:
        return None
    nf, nr = fields.value, rows.value
    starts = np.empty(nf, np.int64)
    lens = np.empty(nf, np.int64)
    quoted = np.empty(nf, np.uint8)
    row_ends = np.empty(nr, np.int64)
    rc = lib.dbtpu_csv_scan(data, n, delim.encode()[0:1], quote.encode()[0:1],
                            starts, lens, quoted, row_ends)
    if rc != 0:
        return None
    return starts, lens, quoted, row_ends
