"""ctypes binding for the native DB postprocess (db_postprocess.cc).

Compiled on first use with the system toolchain (same scheme as
wts_native.py); ops/db.py falls back to its numpy implementation when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "db_postprocess.cc")
_SO = os.path.join(_DIR, "_db_postprocess.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        tmp = f"{_SO}.{os.getpid()}.tmp"
        try:
            # compile to a per-process temp path and os.replace() so the .so
            # appears atomically (concurrent cold-path processes can't CDLL a
            # half-written file)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", tmp], check=True, capture_output=True)
            os.replace(tmp, _SO)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise ImportError(f"native DB postprocess unavailable: {e}")
    lib = ctypes.CDLL(_SO)
    lib.db_boxes.restype = ctypes.c_int64
    lib.db_boxes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def db_boxes_from_prob(prob: np.ndarray, bin_thresh: float = 0.3,
                       box_thresh: float = 0.7, unclip_ratio: float = 1.5,
                       max_candidates: int = 1000, min_size: int = 3,
                       ) -> List[Tuple[np.ndarray, float]]:
    """Same contract as ops.db.db_boxes_from_prob, native implementation."""
    lib = _load_lib()
    prob = np.ascontiguousarray(prob, np.float32)
    h, w = prob.shape
    boxes = np.empty((max_candidates, 8), np.float32)
    scores = np.empty((max_candidates,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    n = lib.db_boxes(prob.ctypes.data_as(fp), h, w,
                     bin_thresh, box_thresh, unclip_ratio,
                     max_candidates, min_size,
                     boxes.ctypes.data_as(fp), scores.ctypes.data_as(fp),
                     max_candidates)
    return [(boxes[i].reshape(4, 2).copy(), float(scores[i]))
            for i in range(n)]
