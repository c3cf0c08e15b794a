"""Native TensorFlow checkpoint-V2 reader — numpy only, no TF wheel needed.

The reference's psenet exporter (reference psenet/gen_tf_wts.py:2-9) walks a
TF checkpoint with `pywrap_tensorflow.NewCheckpointReader` and writes every
variable to .wts. This module reads the same on-disk format directly so
`gen-wts --format tf` works without a TensorFlow install.

A V2 checkpoint is a *tensor bundle*:
  <prefix>.index                — an immutable LevelDB-style table mapping
                                  variable name → BundleEntryProto
  <prefix>.data-NNNNN-of-MMMMM — raw little-endian tensor bytes per shard

Index table layout (leveldb table_format; TF writes it uncompressed —
tensorflow/core/util/tensor_bundle writes with kNoCompression):
  [data block]* [metaindex block] [index block] footer(48B)
  footer  = BlockHandle(metaindex) BlockHandle(index) pad→40B
            magic 0xdb4775248b80fb57 (little-endian)
  block   = entries, restart uint32[n], uint32 n, then 1B compression type
            (0 = none) + 4B crc32c trailer
  entry   = varint shared_len, varint unshared_len, varint value_len,
            key[unshared], value   (keys prefix-compressed, sorted)

BundleEntryProto (tensorflow/core/protobuf/tensor_bundle.proto):
  1 dtype (varint)    2 shape (TensorShapeProto: repeated Dim{1 size})
  3 shard_id (varint) 4 offset (varint)  5 size (varint)  6 crc32c (fixed32)
The empty key "" holds the BundleHeaderProto (num_shards etc.).
"""

from __future__ import annotations

import glob
import os
import re
import struct
from typing import Dict, Iterator, Tuple

import numpy as np

_FOOTER_MAGIC = 0xDB4775248B80FB57

# tensorflow DataType enum → numpy
_TF_DTYPES = {1: np.float32, 2: np.float64, 3: np.int32, 4: np.uint8,
              5: np.int16, 6: np.int8, 7: np.bytes_, 9: np.int64,
              10: np.bool_, 14: None,  # DT_BFLOAT16: no numpy analog
              17: np.uint16, 19: np.float16, 22: np.uint32, 23: np.uint64}
_TF_FLAGS = {np.dtype(np.float32): 1, np.dtype(np.float64): 2,
             np.dtype(np.int32): 3, np.dtype(np.int64): 9,
             np.dtype(np.float16): 19}


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _block_entries(block: bytes) -> Iterator[Tuple[bytes, bytes]]:
    """Iterate (key, value) of one uncompressed leveldb block (no trailer)."""
    if len(block) < 4:
        return
    n_restarts = struct.unpack("<I", block[-4:])[0]
    limit = len(block) - 4 * (n_restarts + 1)
    pos, key = 0, b""
    while pos < limit:
        shared, pos = _varint(block, pos)
        unshared, pos = _varint(block, pos)
        vlen, pos = _varint(block, pos)
        key = key[:shared] + block[pos:pos + unshared]
        pos += unshared
        yield key, block[pos:pos + vlen]
        pos += vlen


def _read_block(buf: bytes, offset: int, size: int) -> bytes:
    comp = buf[offset + size]
    if comp != 0:
        raise ValueError(
            f"compressed table block (type={comp}); TF writes bundle "
            "indexes uncompressed — refusing to guess")
    return buf[offset:offset + size]


def _table_items(buf: bytes) -> Iterator[Tuple[bytes, bytes]]:
    footer = buf[-48:]
    if struct.unpack("<Q", footer[40:])[0] != _FOOTER_MAGIC:
        raise ValueError("not a leveldb-format table (.index) file")
    mi_off, p = _varint(footer, 0)
    mi_size, p = _varint(footer, p)
    ix_off, p = _varint(footer, p)
    ix_size, p = _varint(footer, p)
    del mi_off, mi_size  # metaindex unused
    for _, handle in _block_entries(_read_block(buf, ix_off, ix_size)):
        d_off, q = _varint(handle, 0)
        d_size, q = _varint(handle, q)
        yield from _block_entries(_read_block(buf, d_off, d_size))


def _parse_proto(buf: bytes) -> Dict[int, list]:
    """Minimal wire-format walk: field_no → list of raw values."""
    out: Dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _varint(buf, pos)
        elif wire == 1:
            val = struct.unpack("<Q", buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<I", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unsupported proto wire type {wire}")
        out.setdefault(field, []).append(val)
    return out


def _entry_shape(shape_msg: bytes) -> Tuple[int, ...]:
    dims = []
    for dim in _parse_proto(shape_msg).get(2, []):
        dims.append(_parse_proto(dim).get(1, [0])[0])
    return tuple(dims)


def read_tf_checkpoint(prefix: str) -> Dict[str, np.ndarray]:
    """Read every tensor of a TF checkpoint-V2 bundle → {name: array}.

    `prefix` is the checkpoint path as TF names it (no .index suffix), or
    the .index file itself, or a directory containing exactly one bundle."""
    if os.path.isdir(prefix):
        idx = sorted(glob.glob(os.path.join(prefix, "*.index")))
        if len(idx) != 1:
            raise ValueError(f"{prefix}: expected exactly one .index file")
        prefix = idx[0][:-len(".index")]
    elif prefix.endswith(".index"):
        prefix = prefix[:-len(".index")]
    with open(prefix + ".index", "rb") as f:
        buf = f.read()

    shards: Dict[int, np.memmap] = {}

    def shard(sid: int) -> np.ndarray:
        if sid not in shards:
            pat = f"{prefix}.data-{sid:05d}-of-*"
            paths = glob.glob(pat)
            if not paths:
                raise FileNotFoundError(pat)
            shards[sid] = np.memmap(paths[0], np.uint8, mode="r")
        return shards[sid]

    out: Dict[str, np.ndarray] = {}
    for key, value in _table_items(buf):
        if not key:  # BundleHeaderProto
            continue
        msg = _parse_proto(value)
        if 7 in msg:  # sliced variable: partitions unsupported
            raise ValueError(f"{key.decode()}: sliced tensors unsupported")
        dtype_flag = msg.get(1, [1])[0]
        np_dt = _TF_DTYPES.get(dtype_flag)
        shape = _entry_shape(msg[2][0]) if 2 in msg else ()
        sid = msg.get(3, [0])[0]
        off = msg.get(4, [0])[0]
        size = msg.get(5, [0])[0]
        raw = bytes(shard(sid)[off:off + size])
        name = key.decode("utf-8")
        if np_dt is None:  # bfloat16: widen via uint16 bit tricks
            u = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
            out[name] = u.view(np.float32).reshape(shape)
        elif np_dt is np.bytes_:
            continue  # string tensors are not weights
        else:
            out[name] = np.frombuffer(raw, np_dt).reshape(shape).copy()
    return out


# ---------------------------------------------------------------- writer --
# Fixture-grade bundle writer (roundtrip tests / interchange). Emits the
# same layout the reader parses: uncompressed blocks, zero CRCs (the reader
# does not verify checksums).

def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _enc_block(items) -> bytes:
    body = bytearray()
    for key, value in items:  # every entry its own restart (shared=0)
        body += _enc_varint(0) + _enc_varint(len(key))
        body += _enc_varint(len(value)) + key + value
    body += struct.pack("<II", 0, 1)  # restarts=[0], n=1
    return bytes(body)


def _enc_entry(dtype_flag: int, shape, sid: int, off: int, size: int) -> bytes:
    msg = bytearray([0x08]) + _enc_varint(dtype_flag)
    dims = b"".join(bytes([0x12, len(_enc_varint(d)) + 1, 0x08])
                    + _enc_varint(d) for d in shape)
    msg += bytes([0x12]) + _enc_varint(len(dims)) + dims
    msg += bytes([0x18]) + _enc_varint(sid)
    msg += bytes([0x20]) + _enc_varint(off)
    msg += bytes([0x28]) + _enc_varint(size)
    return bytes(msg)


def write_tf_checkpoint(prefix: str, tensors: Dict[str, np.ndarray]) -> None:
    data = bytearray()
    entries = []
    for name in sorted(tensors):
        arr = np.asarray(tensors[name])  # NOT ascontiguousarray: keep 0-d
        if arr.dtype not in _TF_FLAGS:
            arr = arr.astype(np.float32)
        raw = arr.tobytes()
        entries.append((name.encode(), _enc_entry(
            _TF_FLAGS[arr.dtype], arr.shape, 0, len(data), len(raw))))
        data += raw
    with open(f"{prefix}.data-00000-of-00001", "wb") as f:
        f.write(bytes(data))

    blocks = bytearray()

    def put_block(items) -> bytes:
        handle = _enc_varint(len(blocks)) + _enc_varint(len(_enc_block(items)))
        blocks.extend(_enc_block(items) + b"\x00" + b"\x00" * 4)
        return handle

    data_handle = put_block([(b"", b"")] + entries)  # "" = header slot
    meta_handle = put_block([])
    index_handle = put_block([(b"\xff", data_handle)])
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", _FOOTER_MAGIC)
    with open(f"{prefix}.index", "wb") as f:
        f.write(bytes(blocks) + footer)


_CKPT_RE = re.compile(r"\.(index|data-\d{5}-of-\d{5})$")


def looks_like_tf_checkpoint(path: str) -> bool:
    if os.path.isdir(path):
        return bool(glob.glob(os.path.join(path, "*.index")))
    return bool(_CKPT_RE.search(path)) or os.path.exists(path + ".index")
