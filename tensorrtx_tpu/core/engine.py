"""Engine lifecycle: build ≙ `-s`, load+run ≙ `-d`.

Reference analog (SURVEY.md L3, yolo11/yolo11_det.cpp:16-60):
  - build: .wts → weight map → graph → TensorRT autotune → .engine file
  - run:   .engine → deserialize → IExecutionContext → enqueue

TPU-native formulation:
  - build: .wts → WeightMap → param pytree (BN folded, dtype cast) → jit'd
    apply, AOT-lowered for the configured (batch, H, W) → engine directory
    holding params.npz + meta.json (+ optional jax.export StableHLO blob).
  - run:   load params, re-jit (XLA compile cache makes this cheap) or load
    the exported executable; __call__ runs the fused program.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.params import WeightMap, resolve_dtype
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.core.wts import load_wts

__all__ = ["Engine", "build_engine", "load_engine", "enable_persistent_cache"]

_META_FILE = "meta.json"
_PARAMS_FILE = "params.npz"
_AOT_FILE = "program.stablehlo"


def enable_persistent_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at an engine-local dir.

    The TPU analog of TensorRT's serialized .engine: the first `run` pays
    the XLA compile, every later process reuses the compiled executable
    from disk (measured 1.8 s → 0.2 s even through the remote-compile
    relay). `cli run` calls this with <engine>/xla_cache."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _flatten_params(tree):
    """→ (path→ndarray, [paths whose leaf is None]).

    None leaves (e.g. bias-less convs) can't live in an npz; their paths are
    recorded in meta.json and re-inserted on load so the pytree structure
    survives the roundtrip."""
    flat = {}
    none_paths = []
    leaves_with_path = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None)[0]
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if leaf is None:
            none_paths.append(key)
            continue
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16 or arr.dtype.kind == "V":
            # numpy has no bfloat16: store as f32, re-cast on load per the
            # engine's recorded precision
            arr = np.asarray(leaf, dtype=np.float32)
        flat[key] = arr
    return flat, none_paths


class Engine:
    """A compiled model: params pytree + jitted apply + config."""

    def __init__(self, name: str, params, cfg, precision: str = "fp32"):
        self.name = name
        self.model = get_model(name)
        self.params = params
        self.cfg = cfg
        self.precision = precision
        # Half-precision engines compute in their dtype regardless of the
        # input's dtype (weights follow activations, so an f32 input would
        # silently upcast the whole network).
        cast = (resolve_dtype(precision)
                if precision in ("bf16", "bfloat16", "fp16", "float16") else None)

        def _run(p, x):
            if cast is not None and jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(cast)
            return self.model.apply(p, x, self.cfg)

        self._jitted = jax.jit(_run)
        self._aot_path: Optional[str] = None
        self._aot_batch: Optional[int] = None
        self._aot_fn = None

    def attach_aot(self, path: str, batch: int) -> None:
        """Use a serialized jax.export program (written by save(export_aot=
        True)) for calls at its export batch — deserialization skips the
        Python re-trace that Engine.load otherwise pays (the TRT
        deserializeCudaEngine analog)."""
        self._aot_path, self._aot_batch = path, batch

    def _aot(self):
        if self._aot_fn is None:
            from jax import export as jexport

            with open(self._aot_path, "rb") as f:
                self._aot_fn = jexport.deserialize(f.read()).call
        return self._aot_fn

    def __call__(self, x):
        # getattr: subclasses (e.g. QuantizedEngine) may bypass __init__
        if getattr(self, "_aot_path", None) is not None \
                and x.shape[0] == self._aot_batch:
            dtype = (resolve_dtype(self.precision)
                     if self.precision != "int8" else jnp.float32)
            return self._aot()(self.params, jnp.asarray(x, dtype))
        return self._jitted(self.params, x)

    def raw_apply(self, params, x):
        """Traceable forward for embedding into larger jitted programs
        (ServingPipeline fuses preprocess around it)."""
        return self.model.apply(params, x, self.cfg)

    def warmup(self, batch: int = 1):
        h, w, c = self.model.input_shape(self.cfg)
        x = jnp.zeros((batch, h, w, c), dtype=resolve_dtype(self.precision)
                      if self.precision != "int8" else jnp.float32)
        out = self(x)
        jax.block_until_ready(out)
        return out

    # -- serialization -------------------------------------------------------

    def save(self, path: str, export_aot: bool = False,
             aot_batch: int = 1) -> None:
        """Write the engine dir. With ``export_aot``, also serialize the
        jax.export AOT program (deserialized by `load`, skipping re-trace);
        off by default since tracing big graphs at save time costs seconds."""
        os.makedirs(path, exist_ok=True)
        flat, none_paths = _flatten_params(self.params)
        np.savez(os.path.join(path, _PARAMS_FILE), **flat)
        treedef = jax.tree_util.tree_structure(self.params)
        meta = {
            "name": self.name,
            "precision": self.precision,
            "cfg": dataclasses.asdict(self.cfg) if dataclasses.is_dataclass(self.cfg) else self.cfg,
            "treedef": str(treedef),
            "none_paths": none_paths,
            "format_version": 1,
        }
        if export_aot and self.precision != "int8":
            self.export_stablehlo(os.path.join(path, _AOT_FILE),
                                  batch=aot_batch)
            meta["aot_batch"] = aot_batch
        with open(os.path.join(path, _META_FILE), "w") as f:
            json.dump(meta, f, indent=1)

    @staticmethod
    def load(path: str) -> "Engine":
        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        model = get_model(meta["name"])
        cfg = model.default_cfg()
        if dataclasses.is_dataclass(cfg):
            cfg = dataclasses.replace(cfg, **{
                k: v for k, v in meta["cfg"].items()
                if k in {f.name for f in dataclasses.fields(cfg)}
            })
        else:
            cfg = meta["cfg"]
        data = np.load(os.path.join(path, _PARAMS_FILE))
        # Rebuild the pytree by re-running build-time structure with stored leaves:
        # we store flattened path→leaf; reconstruct nested dict/list structure.
        params = _unflatten(dict(data), meta.get("none_paths", ()))
        precision = meta["precision"]
        if precision in ("bf16", "bfloat16", "fp16", "float16"):
            dtype = resolve_dtype(precision)
            params = jax.tree.map(
                lambda a: jnp.asarray(a, dtype)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else jnp.asarray(a), params)
        else:
            params = jax.tree.map(jnp.asarray, params)
        eng = Engine(meta["name"], params, cfg, precision)
        aot = os.path.join(path, _AOT_FILE)
        if meta.get("aot_batch") and os.path.exists(aot):
            eng.attach_aot(aot, int(meta["aot_batch"]))
        return eng

    def export_stablehlo(self, path: str, batch: int = 1) -> None:
        """Serialize the AOT program via jax.export (the .engine blob analog)."""
        from jax import export as jexport

        h, w, c = self.model.input_shape(self.cfg)
        fn = jax.jit(lambda p, x: self.model.apply(p, x, self.cfg))
        args = (
            self.params,
            jax.ShapeDtypeStruct((batch, h, w, c), resolve_dtype(self.precision)
                                 if self.precision != "int8" else jnp.float32),
        )
        exported = jexport.export(fn)(*args)
        with open(path, "wb") as f:
            f.write(exported.serialize())


def _unflatten(flat: Dict[str, np.ndarray], none_paths=()):
    """Invert _flatten_params for nested dicts (list indices become str keys)."""
    root: Dict[str, Any] = {}
    # Nones first so digit-keyed levels keep dense indices before list
    # reconstruction below.
    for key in list(none_paths) + list(flat.keys()):
        val = flat.get(key)
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [fix(node[str(i)]) for i in range(len(keys))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def build_engine(
    name: str,
    wts_path: str,
    precision: str = "fp32",
    cfg=None,
    **cfg_overrides,
) -> Engine:
    """.wts → Engine (the `-s` mode)."""
    model = get_model(name)
    if cfg is None:
        cfg = model.default_cfg()
    if cfg_overrides and dataclasses.is_dataclass(cfg):
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    wm = WeightMap(load_wts(wts_path))
    params = model.build_params(wm, cfg)
    if precision in ("bf16", "fp16", "bfloat16", "float16"):
        dtype = resolve_dtype(precision)
        params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype) if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
            params,
        )
    else:
        params = jax.tree.map(jnp.asarray, params)
    return Engine(name, params, cfg, precision)


def load_engine(path: str) -> Engine:
    """Load an engine dir; int8-flagged engines come back quantized."""
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    if meta.get("int8"):
        from tensorrtx_tpu.core.quant import QuantizedEngine

        return QuantizedEngine.load(path)
    return Engine.load(path)
