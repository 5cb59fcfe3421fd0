"""ctypes bridge to the C++ collate core (data/native_src/collate.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back to pure numpy when a compiler isn't available. The GIL is
released for the duration of the copy (ctypes does this for foreign calls),
so decode threads keep running while a batch is assembled.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "native_src", "collate.cpp")


def _build() -> Optional[str]:
    so_path = os.path.join(os.path.dirname(_SRC), "libcollate.so")
    if os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.collate_u8.restype = ctypes.c_int
        lib.collate_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int]
        _LIB = lib
        return _LIB


def native_collate(dst: np.ndarray, clips: Sequence[np.ndarray],
                   num_threads: int = 4) -> bool:
    """Copy ragged clips into the zeroed (B, T, H, W, C) dst. True on
    success, False -> caller should use the numpy fallback."""
    lib = get_lib()
    if lib is None:
        return False
    b, t_out = dst.shape[0], dst.shape[1]
    frame_bytes = int(np.prod(dst.shape[2:]))
    contiguous = [np.ascontiguousarray(c) for c in clips]
    for c in contiguous:
        if int(np.prod(c.shape[1:])) != frame_bytes:
            return False  # heterogeneous frame sizes -> fallback
    src_ptrs = (ctypes.c_void_p * b)(
        *[c.ctypes.data_as(ctypes.c_void_p).value for c in contiguous])
    t_lens = (ctypes.c_int64 * b)(*[c.shape[0] for c in contiguous])
    ret = lib.collate_u8(
        dst.ctypes.data_as(ctypes.c_void_p), src_ptrs, t_lens,
        b, t_out, frame_bytes, num_threads)
    return ret == 0
