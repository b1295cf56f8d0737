"""ctypes binding for the native C++ data-loader core (native/dataload).

The native path fuses JPEG decode + PIL-compatible antialiased bicubic
resize + crop/flip + BGR normalize + pad into one multithreaded C++ call.
Falls back silently to the PIL path when the shared library isn't built
(``make -C native/dataload``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "dataload", "libpetrdata.so"),
]


class _ImageJob(ctypes.Structure):
    _fields_ = [
        ("jpeg", ctypes.c_void_p),
        ("jpeg_len", ctypes.c_int64),
        ("resize_w", ctypes.c_int),
        ("resize_h", ctypes.c_int),
        ("crop_x", ctypes.c_int),
        ("crop_y", ctypes.c_int),
        ("crop_w", ctypes.c_int),
        ("crop_h", ctypes.c_int),
        ("flip", ctypes.c_int),
        ("out_h", ctypes.c_int),
        ("out_w", ctypes.c_int),
        ("mean", ctypes.c_float * 3),
        ("std", ctypes.c_float * 3),
        ("to_bgr", ctypes.c_int),
        ("out", ctypes.c_void_p),
    ]


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for path in _SO_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.petr_process_batch.restype = ctypes.c_int
                lib.petr_process_batch.argtypes = [
                    ctypes.POINTER(_ImageJob), ctypes.c_int, ctypes.c_int,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return get_lib() is not None


def process_images(
    jpeg_buffers: Sequence[bytes],
    *,
    resize_wh: Tuple[int, int],
    crop: Tuple[int, int, int, int],  # (left, top, right, bottom)
    flip: bool,
    out_hw: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    to_bgr: bool = True,
    n_threads: int = 0,
) -> np.ndarray:
    """Run the fused pipeline on a list of encoded JPEGs.

    Returns (N, out_h, out_w, 3) float32, normalized, zero-padded.
    """
    lib = get_lib()
    assert lib is not None, "native dataload library not built"
    n = len(jpeg_buffers)
    out_h, out_w = out_hw
    out = np.zeros((n, out_h, out_w, 3), np.float32)
    jobs = (_ImageJob * n)()
    # keep buffers alive
    bufs = [np.frombuffer(b, np.uint8) for b in jpeg_buffers]
    l, t, r, b_ = crop
    for i in range(n):
        j = jobs[i]
        j.jpeg = bufs[i].ctypes.data
        j.jpeg_len = len(jpeg_buffers[i])
        j.resize_w, j.resize_h = resize_wh
        j.crop_x, j.crop_y = l, t
        j.crop_w, j.crop_h = r - l, b_ - t
        j.flip = int(flip)
        j.out_h, j.out_w = out_h, out_w
        for c in range(3):
            j.mean[c] = float(mean[c])
            j.std[c] = float(std[c])
        j.to_bgr = int(to_bgr)
        j.out = out[i].ctypes.data
    failures = lib.petr_process_batch(jobs, n, n_threads)
    if failures:
        raise RuntimeError(f"native dataload: {failures} image(s) failed to decode")
    return out
