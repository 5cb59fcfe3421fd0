"""ctypes bridges to the C++ data cores (data/native_src/*.cpp).

* collate.cpp  — parallel ragged-clip collate into the padded batch.
* videodec.cpp — libavformat/libavcodec video decode to RGB24 (T, H, W, 3):
  the first-party analog of the reference's torchvision.read_video backend
  (reference dataloader.py:41-43).

Each shared library builds on first use (g++, cached next to the source)
and degrades gracefully: collate falls back to numpy; the ffmpeg decoder
reports unavailable (ClipDataset raises a clear error for that backend)
when the libav* dev libraries aren't installed. The GIL is released for
the duration of every foreign call, so decode threads keep running while
a batch is assembled.
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


_VDEC_LOCK = threading.Lock()
_VDEC_LIB: Optional[ctypes.CDLL] = None
_VDEC_TRIED = False

_VDEC_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "native_src", "videodec.cpp")


def _build_videodec() -> Optional[str]:
    so_path = os.path.join(os.path.dirname(_VDEC_SRC), "libvideodec.so")
    if os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(_VDEC_SRC)):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, _VDEC_SRC,
             "-lavformat", "-lavcodec", "-lavutil", "-lswscale"],
            check=True, capture_output=True, timeout=180)
        return so_path
    except Exception:
        return None


def get_videodec_lib() -> Optional[ctypes.CDLL]:
    global _VDEC_LIB, _VDEC_TRIED
    with _VDEC_LOCK:
        if _VDEC_LIB is not None or _VDEC_TRIED:
            return _VDEC_LIB
        _VDEC_TRIED = True
        if not os.path.exists(_VDEC_SRC):
            return None
        so = _build_videodec()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.pb_decode_video.restype = ctypes.c_int
        lib.pb_decode_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.pb_decode_video_fps.restype = ctypes.c_int
        lib.pb_decode_video_fps.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.pb_video_free.restype = None
        lib.pb_video_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _VDEC_LIB = lib
        return _VDEC_LIB


def ffmpeg_available() -> bool:
    return get_videodec_lib() is not None


def decode_video_ffmpeg(path: str, max_frames: int = 0,
                        sample_fps: float = 0.0) -> np.ndarray:
    """Decode a video via the first-party libavcodec core -> (T, H, W, 3)
    uint8 RGB. ``sample_fps`` > 0 keeps every round(container_fps /
    sample_fps)-th frame (the stride is computed in the native core from
    the stream's frame rate; dropped frames skip color conversion).
    Raises RuntimeError when the native library is unavailable
    or the file can't be decoded."""
    lib = get_videodec_lib()
    if lib is None:
        raise RuntimeError(
            "ffmpeg decode backend unavailable: the native videodec "
            "library could not be built (needs g++ and the libavformat/"
            "libavcodec/libswscale dev libraries)")
    out = ctypes.POINTER(ctypes.c_uint8)()
    t = ctypes.c_int64()
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    ret = lib.pb_decode_video_fps(path.encode(), max_frames,
                                  float(sample_fps),
                                  ctypes.byref(out), ctypes.byref(t),
                                  ctypes.byref(h), ctypes.byref(w))
    if ret != 0:
        raise RuntimeError(f"ffmpeg decode failed for {path!r} (code {ret})")
    try:
        n = t.value * h.value * w.value * 3
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.pb_video_free(out)
    return arr.reshape(t.value, h.value, w.value, 3)


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
