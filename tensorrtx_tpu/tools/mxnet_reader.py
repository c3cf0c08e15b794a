"""Native MXNet .params reader — numpy only, no mxnet wheel needed.

The reference's arcface exporter (reference arcface/gen_wts.py:4) loads an
insightface MXNet bundle via `face_model.FaceModel` and writes
`model.get_params()` — i.e. the arg/aux NDArrays of a `model-xxxx.params`
file — to .wts with the bare tensor names (no arg:/aux: prefix). This module
parses the NDArray list container directly so `gen-wts --format mxnet`
produces the same tensors without an MXNet install.

File layout (mxnet src/c_api/c_api.cc MXNDArraySave + ndarray.cc
NDArray::Save, all little-endian):

    uint64  kMXAPINDArrayListMagic = 0x112
    uint64  reserved = 0
    uint64  n_arrays
      n_arrays × NDArray:
        V2 (mxnet ≥0.11): uint32 magic 0xF993FAC9; int32 stype (0 = dense);
            uint32 ndim; uint32 dims[ndim]
        V3 (mxnet ≥1.5 np-shape): uint32 magic 0xF993FACA; int32 stype;
            int32 ndim; int64 dims[ndim]
        V1 (legacy, no magic): uint32 ndim; uint32 dims[ndim]
        then all versions: int32 dev_type; int32 dev_id; int32 type_flag;
            raw row-major data
    uint64  n_names
      n_names × (uint64 len; bytes)   — "arg:conv0_weight" / "aux:bn0_..."
"""

from __future__ import annotations

import struct
from typing import Dict

import numpy as np

_LIST_MAGIC = 0x112
_V2_MAGIC = 0xF993FAC9
_V3_MAGIC = 0xF993FACA

# mxnet type_flag → numpy dtype (mshadow/base.h)
_DTYPES = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8,
           4: np.int32, 5: np.int8, 6: np.int64}
_DTYPE_FLAGS = {np.dtype(v): k for k, v in _DTYPES.items()}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated mxnet .params file")
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.take(8))[0]


def _read_ndarray(r: _Reader) -> np.ndarray:
    first = r.u32()
    if first == _V2_MAGIC:
        stype = r.i32()
        if stype != 0:
            raise ValueError(f"sparse NDArray (stype={stype}) unsupported")
        ndim = r.u32()
        shape = tuple(r.u32() for _ in range(ndim))
    elif first == _V3_MAGIC:
        stype = r.i32()
        if stype != 0:
            raise ValueError(f"sparse NDArray (stype={stype}) unsupported")
        ndim = r.i32()
        shape = tuple(r.i64() for _ in range(ndim))
    else:  # V1: `first` was the ndim
        ndim = first
        if ndim > 32:
            raise ValueError("corrupt .params: implausible legacy ndim")
        shape = tuple(r.u32() for _ in range(ndim))
    r.i32()  # dev_type
    r.i32()  # dev_id
    type_flag = r.i32()
    if type_flag not in _DTYPES:
        raise ValueError(f"unknown mxnet type_flag {type_flag}")
    dt = np.dtype(_DTYPES[type_flag])
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    data = np.frombuffer(r.take(n * dt.itemsize), dt)
    return data.reshape(shape).copy()


def read_mxnet_params(path: str, strip_prefixes: bool = True
                      ) -> Dict[str, np.ndarray]:
    """Parse a `mx.nd.save`-style .params file → {name: array}.

    strip_prefixes drops the leading "arg:"/"aux:" so names match what the
    reference's exporter writes (model.get_params() dict keys)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.u64() != _LIST_MAGIC:
        raise ValueError(f"{path}: not an MXNet NDArray list file")
    r.u64()  # reserved
    arrays = [_read_ndarray(r) for _ in range(r.u64())]
    n_names = r.u64()
    if n_names != len(arrays):
        raise ValueError(f"{path}: {len(arrays)} arrays but {n_names} names")
    names = [r.take(r.u64()).decode("utf-8") for _ in range(n_names)]
    out = {}
    for name, arr in zip(names, arrays):
        if strip_prefixes and name[:4] in ("arg:", "aux:"):
            name = name[4:]
        out[name] = arr
    return out


def write_mxnet_params(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """V2-format writer (test fixtures / interchange)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<QQQ", _LIST_MAGIC, 0, len(tensors)))
        for arr in tensors.values():
            arr = np.asarray(arr)  # NOT ascontiguousarray: keep 0-d shapes
            if arr.dtype not in _DTYPE_FLAGS:
                arr = arr.astype(np.float32)
            f.write(struct.pack("<Ii", _V2_MAGIC, 0))
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}I", *arr.shape))
            f.write(struct.pack("<iii", 1, 0, _DTYPE_FLAGS[arr.dtype]))
            f.write(arr.tobytes())
        f.write(struct.pack("<Q", len(tensors)))
        for name in tensors:
            nb = name.encode("utf-8")
            f.write(struct.pack("<Q", len(nb)))
            f.write(nb)
