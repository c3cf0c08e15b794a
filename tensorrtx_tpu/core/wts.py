"""`.wts` plain-text weight interchange format.

Format (reference: tutorials/getting_started.md:107-131, lenet/gen_wts.py:83-96):

    <count>\n
    <name> <num_values> <hex32> <hex32> ...\n   (one line per tensor)

Each ``hex32`` token is the big-endian byte representation of a float32 (or, for
int64 tensors exported by some gen_wts variants, still 4-byte words). The C++
loader in the reference (lenet/utils.h:49-80) parses each token with
``input >> std::hex``, i.e. as the integer whose bytes are the float.

This module provides a pure-Python reader/writer plus an optional fast C++
parser (tensorrtx_tpu/native) used automatically when built.
"""

from __future__ import annotations

import struct
from typing import Dict, Mapping

import numpy as np

__all__ = ["load_wts", "save_wts"]


def _load_wts_python(path: str) -> Dict[str, np.ndarray]:
    weights: Dict[str, np.ndarray] = {}
    with open(path, "r") as f:
        header = f.readline().strip()
        count = int(header)
        for _ in range(count):
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated .wts file")
            parts = line.split()
            name = parts[0]
            n = int(parts[1])
            toks = parts[2:]
            if len(toks) != n:
                raise ValueError(
                    f"{path}: tensor {name!r} declares {n} values, found {len(toks)}"
                )
            # Parse all hex tokens at once: each is the big-endian float32 bits.
            buf = bytes.fromhex("".join(toks))
            arr = np.frombuffer(buf, dtype=">f4").astype(np.float32)
            weights[name] = arr
    return weights


def load_wts(path: str) -> Dict[str, np.ndarray]:
    """Parse a .wts file into a flat ``{name: float32 1-D array}`` map."""
    try:
        from tensorrtx_tpu.native import wts_native  # type: ignore

        return wts_native.load(path)
    except ImportError:
        return _load_wts_python(path)


def save_wts(path: str, tensors: Mapping[str, np.ndarray]) -> None:
    """Write tensors in .wts format (used by exporters and test fixtures)."""
    with open(path, "w") as f:
        f.write(f"{len(tensors)}\n")
        for name, v in tensors.items():
            flat = np.asarray(v, dtype=np.float32).reshape(-1)
            f.write(f"{name} {flat.size}")
            # big-endian float32 hex, matching gen_wts.py: struct.pack('>f', x).hex()
            be = flat.astype(">f4").tobytes()
            for i in range(flat.size):
                f.write(" " + be[4 * i : 4 * i + 4].hex())
            f.write("\n")


def state_dict_to_wts(path: str, state_dict: Mapping[str, "object"]) -> None:
    """Dump a torch-style state_dict (name -> tensor) to .wts.

    Mirrors the per-model gen_wts.py scripts in the reference: every entry of
    ``state_dict`` is flattened to float32.
    """
    tensors = {}
    for k, v in state_dict.items():
        arr = np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy() if hasattr(v, "cpu") else v)
        tensors[k] = arr.astype(np.float32)
    save_wts(path, tensors)
