"""Checkpoint → .wts exporter (the reference ships one gen_wts.py per model,
e.g. yolo11/gen_wts.py, lenet/lenet.py save path; this is the one shared
user-facing tool).

Supported inputs:
  - torch checkpoints (.pt / .pth): plain state_dicts, {'state_dict': ...}
    wrappers (mmlab/lightning), and ultralytics {'model': nn.Module} bundles
    (the yolo family's .pt layout — matches yolo11/gen_wts.py semantics:
    ckpt['model'].float().state_dict()).
  - Paddle inference dirs (inference.json/.pdmodel + .pdiparams): parsed
    natively with numpy — no paddle wheel needed (tools/paddle_reader.py;
    reference analog ppocrv5/gen_wts.py:71-80 which requires paddle).
  - MXNet .params NDArray bundles (insightface/arcface — reference
    arcface/gen_wts.py:4): parsed natively, arg:/aux: prefixes stripped
    (tools/mxnet_reader.py).
  - TF checkpoint-V2 bundles (<ckpt>.index + .data-* — reference
    psenet/gen_tf_wts.py:2): parsed natively (tools/tf_reader.py).
  - .npz archives (name → array): the universal escape hatch for frameworks
    we can't import here.

Weight names pass through unchanged — model builders in this framework use
the upstream checkpoints' naming (torchvision/ultralytics/paddle), so a
converted file feeds `cli build` directly.
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict

import numpy as np

__all__ = ["extract_tensors", "convert", "main"]


def _from_torch(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        # safe path first: plain state_dicts load without pickle code-exec
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # nn.Module bundles (ultralytics .pt) need full unpickling; warn, since
        # this executes code from the checkpoint file.
        print(f"gen_wts: {path} is not a plain state_dict; falling back to "
              "weights_only=False (unpickles arbitrary objects — only convert "
              "checkpoints you trust)", file=sys.stderr)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    # unwrap common containers
    if hasattr(ckpt, "state_dict"):          # a bare nn.Module
        sd = ckpt.float().state_dict() if hasattr(ckpt, "float") else ckpt.state_dict()
    elif isinstance(ckpt, dict) and "model" in ckpt and hasattr(ckpt["model"], "state_dict"):
        # ultralytics bundle (yolo11/gen_wts.py: model = ckpt['model'].float())
        sd = ckpt["model"].float().state_dict()
    elif isinstance(ckpt, dict) and "state_dict" in ckpt and isinstance(ckpt["state_dict"], dict):
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict):
        sd = ckpt
    else:
        raise ValueError(f"unrecognized torch checkpoint structure: {type(ckpt)}")
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().float().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v.astype(np.float32)
        # non-tensor entries (e.g. metadata) are skipped
    return out


def _from_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: np.asarray(z[k], np.float32) for k in z.files}


def extract_tensors(path: str, fmt: str = "auto") -> Dict[str, np.ndarray]:
    import os

    if fmt == "auto":
        if path.endswith(".npz"):
            fmt = "npz"
        elif path.endswith(".params"):
            fmt = "mxnet"
        elif path.endswith(".index") or _is_tf_ckpt(path):
            fmt = "tf"
        elif os.path.isdir(path) or path.endswith(".pdiparams"):
            fmt = "paddle"
        else:
            fmt = "torch"
    if fmt == "torch":
        return _from_torch(path)
    if fmt == "npz":
        return _from_npz(path)
    if fmt == "paddle":
        from tensorrtx_tpu.tools.paddle_reader import read_paddle_dir

        return {k: np.asarray(v, np.float32)
                for k, v in read_paddle_dir(path).items()}
    if fmt == "mxnet":
        # insightface/arcface .params bundles (ref arcface/gen_wts.py:4)
        from tensorrtx_tpu.tools.mxnet_reader import read_mxnet_params

        return {k: np.asarray(v, np.float32)
                for k, v in read_mxnet_params(path).items()}
    if fmt == "tf":
        # TF checkpoint-V2 bundles (ref psenet/gen_tf_wts.py:2-9). Names and
        # layouts pass through unchanged: our TF-family builders (psenet)
        # consume HWIO conv weights directly — no OIHW transpose needed.
        from tensorrtx_tpu.tools.tf_reader import read_tf_checkpoint

        return {k: np.asarray(v, np.float32)
                for k, v in read_tf_checkpoint(path).items()}
    raise ValueError(
        f"unknown format {fmt!r} (use torch|npz|paddle|mxnet|tf)")


def _is_tf_ckpt(path: str) -> bool:
    from tensorrtx_tpu.tools.tf_reader import looks_like_tf_checkpoint

    try:
        return looks_like_tf_checkpoint(path)
    except OSError:
        return False


def convert(input_path: str, output_path: str, fmt: str = "auto",
            exclude: str = "", strip_prefix: str = "") -> int:
    """Convert a checkpoint to .wts; returns the number of tensors written."""
    from tensorrtx_tpu.core.wts import save_wts

    tensors = extract_tensors(input_path, fmt)
    if exclude:
        pat = re.compile(exclude)
        tensors = {k: v for k, v in tensors.items() if not pat.search(k)}
    if strip_prefix:
        tensors = {
            (k[len(strip_prefix):] if k.startswith(strip_prefix) else k): v
            for k, v in tensors.items()}
    if not tensors:
        raise ValueError("no tensors extracted from checkpoint")
    save_wts(output_path, tensors)
    return len(tensors)


def main(argv=None):
    ap = argparse.ArgumentParser(
        "gen_wts", description="checkpoint (.pt/.pth/.npz) → .wts")
    ap.add_argument("-w", "--weights", required=True, help="input checkpoint")
    ap.add_argument("-o", "--output", required=True, help="output .wts path")
    ap.add_argument("--format", default="auto",
                    choices=["auto", "torch", "npz", "paddle", "mxnet", "tf"])
    ap.add_argument("--exclude", default="",
                    help="regex of tensor names to drop")
    ap.add_argument("--strip-prefix", default="",
                    help="prefix to remove from tensor names (e.g. 'module.')")
    args = ap.parse_args(argv)
    n = convert(args.weights, args.output, args.format, args.exclude,
                args.strip_prefix)
    print(f"wrote {n} tensors to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
