"""Paddle inference-dir → tensors, without importing paddle.

The reference's ppocrv5 exporter (ppocrv5/gen_wts.py:71-80) loads a Paddle
PIR inference model with the `paddle` runtime and dumps its parameters to
.wts. This environment (and many TPU deployment hosts) has no paddle wheel,
so this module parses the on-disk format directly with numpy:

  <dir>/inference.json       PIR program (JSON)         — parameter NAMES
  <dir>/inference.pdmodel    legacy program (protobuf)  — parameter NAMES
  <dir>/inference.pdiparams  combined parameters        — tensor DATA

The .pdiparams stream is a concatenation of serialized LoDTensors
(paddle/fluid/framework/lod_tensor.cc SerializeToStream):

  u32   lod version (0)
  u64   lod level count, then per level: u64 byte-size + payload (params: 0)
  u32   tensor version (0)
  i32   N = byte-size of a VarType.TensorDesc protobuf
  N×u8  TensorDesc { required Type data_type = 1; repeated int64 dims = 2; }
  raw   prod(dims) × sizeof(dtype) bytes

Paddle's serializer writes combined parameters sorted by name
(paddle.static.io._serialize_persistables sorts persistable vars), so the
sorted name list from the program zips 1:1 with the parsed tensor stream;
the zip is validated by count and the caller can cross-check shapes against
the model builder. If `paddle` IS importable we defer to it, matching the
reference exporter exactly.
"""

from __future__ import annotations

import json
import os
import re
import struct
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["read_paddle_dir"]

# VarType.Type enum (paddle framework.proto) → numpy dtype
_DTYPES = {
    0: np.bool_, 1: np.int16, 2: np.int32, 3: np.int64,
    4: np.float16, 5: np.float32, 6: np.float64,
    20: np.uint8, 21: np.int8,
    22: np.uint16,   # BF16 stored as raw 16-bit words
}

_PARAM_NAME_RE = re.compile(rb"[A-Za-z][\w./@-]*\.(?:w|b)_\d+")


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _parse_tensor_desc(buf: bytes) -> Tuple[int, List[int]]:
    """Minimal protobuf walk of VarType.TensorDesc (fields 1, 2)."""
    pos, dtype, dims = 0, 5, []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            if field == 1:
                dtype = v
            elif field == 2:
                dims.append(v)
        elif wire == 2:               # length-delimited (packed dims)
            n, pos = _read_varint(buf, pos)
            if field == 2:
                end = pos + n
                while pos < end:
                    v, pos = _read_varint(buf, pos)
                    dims.append(v)
            else:
                pos += n
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire} in TensorDesc")
    # dims are int64 varints; undo two's-complement for the -1 sentinel
    dims = [d - (1 << 64) if d >= (1 << 63) else d for d in dims]
    return dtype, dims


def parse_pdiparams(data: bytes) -> List[np.ndarray]:
    """Parse a combined .pdiparams byte stream into tensors, in file order."""
    tensors, pos = [], 0
    while pos < len(data):
        (lod_ver,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if lod_ver != 0:
            raise ValueError(f"unsupported LoDTensor version {lod_ver} "
                             f"at offset {pos - 4}")
        (lod_levels,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        for _ in range(lod_levels):
            (nbytes,) = struct.unpack_from("<Q", data, pos)
            pos += 8 + nbytes
        (tensor_ver,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if tensor_ver != 0:
            raise ValueError(f"unsupported tensor version {tensor_ver}")
        (desc_len,) = struct.unpack_from("<i", data, pos)
        pos += 4
        dtype_id, dims = _parse_tensor_desc(data[pos:pos + desc_len])
        pos += desc_len
        if dtype_id not in _DTYPES:
            raise ValueError(f"unsupported paddle dtype id {dtype_id}")
        dt = np.dtype(_DTYPES[dtype_id])
        count = int(np.prod(dims)) if dims else 1
        arr = np.frombuffer(data, dt, count=count, offset=pos)
        pos += count * dt.itemsize
        tensors.append(arr.reshape(dims).copy())
    return tensors


def _names_from_json(program: object) -> List[str]:
    """Collect parameter names from a PIR inference.json program.

    PIR programs carry parameters as `builtin.parameter` ops whose attribute
    block holds the name (key `parameter_name` in the documented schema); we
    walk the whole JSON tolerant of layout revisions and also accept any
    string stored under a *parameter_name-ish key."""
    names: List[str] = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, str) and k in (
                        "parameter_name", "param_name", "is_parameter_name"):
                    names.append(v)
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(program)
    if not names:    # schema drift fallback: paddle param naming convention
        blob = json.dumps(program).encode()
        names = [m.decode() for m in _PARAM_NAME_RE.findall(blob)]
    seen, uniq = set(), []
    for n in names:
        if n not in seen:
            seen.add(n)
            uniq.append(n)
    return uniq


def _names_from_pdmodel(data: bytes) -> List[str]:
    """Parameter names from a legacy .pdmodel ProgramDesc.

    Protobuf embeds every var name as a length-prefixed string; persistable
    parameters follow paddle's `<op>_<idx>.{w,b}_<idx>` convention, so a
    byte-level scan recovers exactly the parameter set without the paddle
    proto schema."""
    seen, uniq = set(), []
    for m in _PARAM_NAME_RE.findall(data):
        n = m.decode()
        if n not in seen:
            seen.add(n)
            uniq.append(n)
    return uniq


def read_paddle_dir(path: str) -> Dict[str, np.ndarray]:
    """Paddle inference dir (or `<dir>/inference` prefix) → name→array."""
    if os.path.isdir(path):
        prefix = os.path.join(path, "inference")
    else:
        prefix = path[:-len(".pdiparams")] if path.endswith(".pdiparams") \
            else path
    params_path = prefix + ".pdiparams"
    if not os.path.exists(params_path):
        raise FileNotFoundError(f"{params_path} not found")

    try:                          # exact reference path when paddle exists
        import paddle  # noqa: F401
        from paddle.static.pir_io import get_pir_parameters

        os.environ.setdefault("FLAGS_enable_pir_api", "1")
        paddle.enable_static()
        exe = paddle.static.Executor(paddle.CPUPlace())
        program, _, _ = paddle.static.load_inference_model(
            prefix, exe)[:3]
        params, _ = get_pir_parameters(program)
        scope = paddle.static.global_scope()
        return {p.name: np.asarray(scope.var(p.name).get_tensor())
                for p in params}
    except ImportError:
        pass

    with open(params_path, "rb") as f:
        tensors = parse_pdiparams(f.read())

    names: List[str] = []
    if os.path.exists(prefix + ".json"):
        with open(prefix + ".json") as f:
            names = _names_from_json(json.load(f))
    elif os.path.exists(prefix + ".pdmodel"):
        with open(prefix + ".pdmodel", "rb") as f:
            names = _names_from_pdmodel(f.read())
    if len(names) != len(tensors):
        raise ValueError(
            f"program lists {len(names)} parameters but {params_path} holds "
            f"{len(tensors)} tensors; if this is a nonstandard export, dump "
            "to .npz with paddle installed and convert that instead")
    # combined save writes tensors sorted by name (see module docstring)
    return dict(zip(sorted(names), tensors))
