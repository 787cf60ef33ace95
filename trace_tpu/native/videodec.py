"""ctypes binding + on-demand build for the native video decoder.

Builds trace_tpu/native/videodec.cpp into libvideodec.so with g++ against the
system FFmpeg dev libraries on first use (cached next to the source).  The
Python video front end (trace_tpu/video/io.py) uses this as its fast path and
falls back to OpenCV when the toolchain or libs are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "videodec.cpp")
_SO = os.path.join(_HERE, "libvideodec.so")
_LIBS = ["avformat", "avcodec", "avutil", "swscale"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeDecoderUnavailable(OSError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ] + [f"-l{l}" for l in _LIBS]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeDecoderUnavailable(
            f"native decoder build failed:\n{proc.stderr[-2000:]}"
        )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.vd_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vd_probe.restype = ctypes.c_int
        lib.vd_read_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vd_read_frames.restype = ctypes.c_int
        lib.vd_last_error.restype = ctypes.c_char_p
        _lib = lib
        return lib


def probe(path: str) -> Tuple[int, float, int, int]:
    """(num_frames, fps, width, height)."""
    lib = _load()
    nf = ctypes.c_int64()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vd_probe(path.encode(), ctypes.byref(nf), ctypes.byref(fps),
                      ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"probe failed: {lib.vd_last_error().decode()}")
    return int(nf.value), float(fps.value), int(w.value), int(h.value)


def read_frames(
    path: str, indices: Sequence[int], max_side: int | None = None
) -> np.ndarray:
    """Decode the given frame indices -> uint8 [n, H, W, 3] RGB.

    ``max_side`` decodes pre-scaled (aspect-preserving, longest side capped,
    even dims) in the SAME libswscale pass that does YUV->RGB — an HD
    source never materializes at native resolution on the host, and the
    cv2 pad-square/resize stage downstream runs on ~7x fewer pixels."""
    lib = _load()
    _, _, w, h = probe(path)
    if max_side and max(w, h) > max_side:
        s = max_side / max(w, h)
        w, h = max(2, int(w * s)) & ~1, max(2, int(h * s)) & ~1
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    n = len(idx)
    out = np.empty((n, h, w, 3), np.uint8)
    rc = lib.vd_read_frames(
        path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h,
    )
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {lib.vd_last_error().decode()}")
    return out
