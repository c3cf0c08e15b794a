"""Deterministic random-weight golden fixtures (seed → output digest).

The reference validates ports by dumping tensors from the source framework
and diffing (ppocrv5/README.md:449-476 dump methodology). Offline, the
equivalent regression net is: fixed seed → RandomWeightMap params → fixed
input → output digest committed to tests/goldens.json. Any refactor that
changes a model's numerics is caught without re-running torch.

Regenerate after an INTENTIONAL numeric change:
    python -m tensorrtx_tpu.tools.goldens [model ...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tests", "goldens.json")

# small-input overrides so the whole sweep runs in CPU-test time; models
# absent here run their default cfg. Sizes keep every stride/window
# constraint of the graph.
OVERRIDES = {
    "alexnet": {"input_h": 224, "input_w": 224},   # fixed-size fc flatten
    "centernet": {"input_h": 128, "input_w": 128},
    "convnextv2": {"input_h": 128, "input_w": 128},
    "csrnet": {"input_h": 128, "input_w": 160},
    "dbnet": {"input_h": 192, "input_w": 320},
    "detr": {"input_h": 192, "input_w": 192},
    "efficientnet": {"input_h": 128, "input_w": 128},
    "ghostnet": {"input_h": 128, "input_w": 160},
    "ghostnetv2": {"input_h": 128, "input_w": 128},
    "hrnet": {"input_h": 128, "input_w": 128},
    "hrnet-ocr": {"input_h": 128, "input_w": 256},
    "hrnet-seg": {"input_h": 128, "input_w": 256},
    "ibnnet": {"input_h": 128, "input_w": 128},
    "inception": {"input_h": 160, "input_w": 160},
    "inceptionv4": {"input_h": 160, "input_w": 160},
    "mnasnet": {"input_h": 128, "input_w": 128},
    "mobilenetv2": {"input_h": 128, "input_w": 128},
    "mobilenetv3": {"input_h": 128, "input_w": 128},
    "pp_docblocklayout": {"input_h": 192, "input_w": 192},
    "pp_doclayout_plus_l": {"input_h": 192, "input_w": 192},
    "pp_formulanet_plus_l": {"input_h": 192, "input_w": 192, "max_len": 8},
    "ppocrv5_det": {"input_h": 192, "input_w": 192},
    "ppocrv5_server_det": {"input_h": 192, "input_w": 192},
    "psenet": {"input_h": 192, "input_w": 192},
    "rcnn": {"input_h": 192, "input_w": 256, "pre_nms_topk": 512,
             "post_nms_topk": 32, "detections_per_image": 16},
    "real-esrgan": {"input_h": 64, "input_w": 64},
    "real-esrgan-x4v3": {"input_h": 64, "input_w": 64},
    "refinedet": {},                               # priors fixed to 320
    "repvgg": {"input_h": 128, "input_w": 128},
    "resnet": {"input_h": 128, "input_w": 128},
    "retinaface": {"input_h": 192, "input_w": 256},
    "retinaface-anticov": {"input_h": 192, "input_w": 192},
    "rt_detr_l_wired_table_cell_det": {"input_h": 192, "input_w": 192},
    "rt_detr_l_wireless_table_cell_det": {"input_h": 192, "input_w": 192},
    "scaled-yolov4": {"input_h": 256, "input_w": 256},
    "senet": {"input_h": 128, "input_w": 128},
    "shufflenetv2": {"input_h": 128, "input_w": 128},
    "slanet_plus": {"input_h": 192, "input_w": 192, "max_steps": 8},
    "slanext_wired": {"input_h": 192, "input_w": 192, "max_steps": 8},
    "squeezenet": {"input_h": 128, "input_w": 128},
    "swin": {"input_h": 192, "input_w": 192},
    "tsm": {"input_h": 128, "input_w": 128},
    "unet": {"input_h": 128, "input_w": 192},
    "uvdoc": {"input_h": 192, "input_w": 192, "resize_h": 184,
              "resize_w": 120},
    "vgg": {},                                     # fixed-size fc flatten
    "vit": {"input_h": 128, "input_w": 128},
    "yolo11": {"input_h": 192, "input_w": 192},
    "yolo26": {"input_h": 192, "input_w": 192},
    "yolop": {"input_h": 192, "input_w": 320},
    "yolov10": {"input_h": 192, "input_w": 192},
    "yolov12": {"input_h": 192, "input_w": 192},
    "yolov13": {"input_h": 192, "input_w": 192},
    "yolov3": {"input_h": 192, "input_w": 192},
    "yolov3-tiny": {"input_h": 192, "input_w": 192},
    "yolov4": {"input_h": 192, "input_w": 192},
    "yolov5": {"input_h": 192, "input_w": 192},
    "yolov5-lite": {"input_h": 192, "input_w": 192},
    "yolov7": {"input_h": 192, "input_w": 192},
    "yolov8": {"input_h": 192, "input_w": 192},
    "yolov9": {"input_h": 192, "input_w": 192},
}


# Variant matrix: the task/scale combos the reference ships per model
# (yolov8 cls/pose/obb/p2/5u, yolov5 cls/seg, yolo26 cls/obb, yolov9 t/s/m,
# yolov12 cls/seg, yolov10 NMS-free, yolov3-tiny). Digest keys are
# "<model>@<variant>"; tests/test_detector_matrix.py checks each against
# the committed golden so no variant passes on shapes alone.
MATRIX = {
    "yolov8@cls": ("yolov8", {"task": "cls", "input_h": 224, "input_w": 224}),
    "yolov5@cls": ("yolov5", {"task": "cls", "input_h": 224, "input_w": 224}),
    "yolo26@cls": ("yolo26", {"task": "cls", "input_h": 224, "input_w": 224}),
    "yolov12@cls": ("yolov12",
                    {"task": "cls", "input_h": 256, "input_w": 256}),
    "yolov10@det320": ("yolov10", {"input_h": 320, "input_w": 320}),
    "yolov3-tiny@det416": ("yolov3-tiny", {"input_h": 416, "input_w": 416}),
    "yolov8@p2": ("yolov8",
                  {"variant": "p2", "input_h": 320, "input_w": 320}),
    "yolov8@5u": ("yolov8",
                  {"variant": "5u", "input_h": 320, "input_w": 320}),
    "yolov9@t": ("yolov9", {"scale": "t", "input_h": 320, "input_w": 320}),
    "yolov9@s": ("yolov9", {"scale": "s", "input_h": 320, "input_w": 320}),
    "yolov9@m": ("yolov9", {"scale": "m", "input_h": 320, "input_w": 320}),
    "yolov9@e": ("yolov9", {"scale": "e", "input_h": 320, "input_w": 320}),
    "yolov8@pose": ("yolov8",
                    {"task": "pose", "input_h": 320, "input_w": 320}),
    "yolov8@obb": ("yolov8", {"task": "obb", "input_h": 320, "input_w": 320}),
    "yolo26@obb": ("yolo26", {"task": "obb", "input_h": 320, "input_w": 320}),
    "yolov5@seg": ("yolov5", {"task": "seg", "input_h": 320, "input_w": 320}),
    "yolov12@seg": ("yolov12",
                    {"task": "seg", "input_h": 320, "input_w": 320}),
}


def _leaf_digest(path, arr):
    a = np.asarray(arr, np.float64).ravel()
    if a.size == 0:
        return {"shape": list(np.shape(arr)), "mean": 0.0, "std": 0.0,
                "sample": []}
    # random weights push some decode exps to inf; clip so the digest stays
    # finite and comparable (the clip boundary itself is config-stable)
    a = np.clip(np.nan_to_num(a, nan=0.0, posinf=1e6, neginf=-1e6),
                -1e6, 1e6)
    step = max(a.size // 8, 1)
    return {
        "shape": list(np.shape(arr)),
        "mean": float(np.round(np.nanmean(a), 6)),
        "std": float(np.round(np.nanstd(a), 6)),
        "sample": [float(np.round(v, 6)) for v in a[::step][:8]],
    }


def compute_golden(name: str):
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    if "@" in name:
        model_name, over = MATRIX[name]
    else:
        model_name, over = name, OVERRIDES.get(name, {})
    model = get_model(model_name)
    cfg = dataclasses.replace(model.default_cfg(), **over)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(seed=0), cfg))
    h, w, c = model.input_shape(cfg)
    # tsm consumes a clip: batch = num_segments frames
    b = getattr(cfg, "num_segments", 1)
    x = jnp.asarray(np.random.default_rng(1234).uniform(
        -1.0, 1.0, (b, h, w, c)), jnp.float32)
    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    leaves = jax.tree.leaves_with_path(out)
    return {jax.tree_util.keystr(path): _leaf_digest(path, leaf)
            for path, leaf in leaves}


def assert_matches(got: dict, exp: dict, ctx: str = "",
                   tol: float = 1.0) -> None:
    """Digest-vs-golden comparison shared by the golden and matrix tests.

    Tolerances absorb XLA CPU fusion-order noise across jax versions while
    still catching any real numerics change (a weight-order or decode bug
    shifts mean/std by orders of magnitude more). tol widens every band by
    a constant factor — the on-device sweep (tools/tpu_smoke.py) compares
    XLA:TPU f32 (matmul precision "highest") against the committed CPU
    digests, whose residual cross-backend noise is larger than CPU-vs-CPU
    but still orders of magnitude below any real mis-lowering."""
    assert set(got) == set(exp), (ctx, set(got) ^ set(exp))
    for key, g in got.items():
        e = exp[key]
        assert g["shape"] == e["shape"], (ctx, key, g["shape"], e["shape"])
        scale = max(abs(e["mean"]) + e["std"], 1e-3)
        assert abs(g["mean"] - e["mean"]) < tol * (2e-3 * scale + 1e-5), \
            (ctx, key, g["mean"], e["mean"])
        assert abs(g["std"] - e["std"]) < tol * (2e-3 * scale + 1e-5), \
            (ctx, key, g["std"], e["std"])
        for a, b in zip(g["sample"], e["sample"]):
            assert abs(a - b) < tol * (5e-3 * scale + 1e-4), (ctx, key, a, b)


def main(argv=None):
    # generate under the SAME backend config the test suite runs with
    # (tests/conftest.py): the 8-device virtual CPU mesh changes XLA CPU
    # codegen enough to shift float results by ~1e-2 on deep graphs
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tensorrtx_tpu.core.registry import list_models

    names = (argv or sys.argv[1:]) or (list_models() + sorted(MATRIX))
    goldens = {}
    if os.path.exists(GOLDEN_PATH):
        goldens = json.load(open(GOLDEN_PATH))
    for name in names:
        try:
            goldens[name] = compute_golden(name)
            print(f"golden: {name} ok", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"golden: {name} FAILED: {e}", file=sys.stderr)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f, indent=0, sort_keys=True)
    print(f"wrote {GOLDEN_PATH} ({len(goldens)} models)", file=sys.stderr)


if __name__ == "__main__":
    main()
