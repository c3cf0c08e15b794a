"""ctypes binding for the native .wts parser (wts_parser.cc).

Compiled on first use with the system toolchain into this package directory;
falls back (ImportError) to the pure-Python parser if no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wts_parser.cc")
_SO = os.path.join(_DIR, "_wts_parser.so")

_lib = None


def _build() -> None:
    # compile to a per-process temp path and os.replace() so the .so appears
    # atomically (concurrent cold-path processes can't CDLL a half-written file)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            _build()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise ImportError(f"native wts parser unavailable: {e}")
    lib = ctypes.CDLL(_SO)
    lib.wts_open.restype = ctypes.c_void_p
    lib.wts_open.argtypes = [ctypes.c_char_p]
    lib.wts_count.restype = ctypes.c_int64
    lib.wts_count.argtypes = [ctypes.c_void_p]
    lib.wts_name.restype = ctypes.c_char_p
    lib.wts_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.wts_size.restype = ctypes.c_int64
    lib.wts_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.wts_read.restype = ctypes.c_int
    lib.wts_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_float)]
    lib.wts_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load(path: str) -> Dict[str, np.ndarray]:
    lib = _load_lib()
    h = lib.wts_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        out: Dict[str, np.ndarray] = {}
        n = lib.wts_count(h)
        for i in range(n):
            name = lib.wts_name(h, i).decode()
            size = lib.wts_size(h, i)
            arr = np.empty(size, dtype=np.float32)
            ok = lib.wts_read(h, i, arr.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
            if not ok:
                raise ValueError(
                    f"{path}: tensor {name!r} declares {size} values, "
                    f"found fewer")
            # hex token is the number 0xAABBCCDD whose 4 bytes are the
            # float's big-endian encoding; storing that uint32 natively
            # yields the float directly (same trick as lenet/utils.h).
            out[name] = arr
        return out
    finally:
        lib.wts_close(h)
