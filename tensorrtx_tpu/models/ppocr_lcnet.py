"""PP-LCNet x1.0 document classifiers (PP-OCRv5 suite).

Three deployed variants (reference: ppocrv5/src/model.cpp:109-231
buildPPLCNetX1_0Model):
  pp_lcnet_x1_0_doc_ori      224x224, 4 classes (document orientation)
  pp_lcnet_x1_0_table_cls    224x224, 2 classes (wired/wireless table)
  pp_lcnet_x1_0_textline_ori  80x160, 2 classes, H-only down-striding

Backbone = depthwise-separable blocks with hard-swish + SE on the last two
stages (ppLcNetBlock, block.cpp:461-477); head = GAP → 1x1 conv(1280) →
hard-swish → x0.8 (exported inference-time dropout scale) → linear → softmax.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.ops import nn

# (cin, cout, dw_name, dw_bn, pw_name, pw_bn, kernel, down, use_se)
# model.cpp:140-204; "down" strides (2,2), or (2,1) for textline.
_BLOCKS = [
    (16, 32, 1, 1, 2, 2, 3, False, False),
    (32, 64, 3, 3, 4, 4, 3, True, False),
    (64, 64, 5, 5, 6, 6, 3, False, False),
    (64, 128, 7, 7, 8, 8, 3, True, False),
    (128, 128, 9, 9, 10, 10, 3, False, False),
    (128, 256, 11, 11, 12, 12, 3, True, False),
    (256, 256, 13, 13, 14, 14, 5, False, False),
    (256, 256, 15, 15, 16, 16, 5, False, False),
    (256, 256, 17, 17, 18, 18, 5, False, False),
    (256, 256, 19, 19, 20, 20, 5, False, False),
    (256, 256, 21, 21, 22, 22, 5, False, False),
    (256, 512, 23, 23, 26, 24, 5, True, True),
    (512, 512, 27, 25, 30, 26, 5, False, True),
]


@dataclasses.dataclass
class LcnetCfg:
    variant: str = "doc_ori"  # doc_ori | table_cls | textline_ori
    input_h: int = 224
    input_w: int = 224
    num_classes: int = 4

    def __post_init__(self):
        if self.variant == "textline_ori":
            self.input_h, self.input_w, self.num_classes = 80, 160, 2
        elif self.variant == "table_cls":
            self.num_classes = 2


def build_params(wm, cfg: LcnetCfg):
    p = {"stem": P.pconv_bn(wm, "conv2d_0", "batch_norm2d_0", 16, 3, 3),
         "blocks": []}
    for (ci, co, dw, dwbn, pw, pwbn, k, down, se) in _BLOCKS:
        bp = {"dw": P.pconv_bn(wm, f"conv2d_{dw}", f"batch_norm2d_{dwbn}",
                               ci, ci, k, groups=ci),
              "pw": P.pconv_bn(wm, f"conv2d_{pw}", f"batch_norm2d_{pwbn}",
                               co, ci, 1)}
        if se:
            bp["se_r"] = P.pconv(wm, f"conv2d_{dw + 1}", ci // 4, ci, 1)
            bp["se_e"] = P.pconv(wm, f"conv2d_{dw + 2}", ci, ci // 4, 1)
        p["blocks"].append(bp)
    p["head_conv"] = P.pconv(wm, "conv2d_31", 1280, 512, 1, bias=False)
    p["fc"] = P.plinear(wm, "linear_0", 1280, cfg.num_classes)
    return p


def apply(params, x, cfg: LcnetCfg):
    """x: (B, H, W, 3) imagenet-normalized NHWC → class probabilities."""
    down = (2, 1) if cfg.variant == "textline_ori" else (2, 2)
    y = nn.hardswish(P.conv(x, params["stem"], stride=2, padding=1))
    for (spec, bp) in zip(_BLOCKS, params["blocks"]):
        ci, co, dw, dwbn, pw, pwbn, k, is_down, se = spec
        s = down if is_down else (1, 1)
        y = nn.hardswish(P.conv(y, bp["dw"], stride=s, padding=k // 2,
                                groups=ci))
        if se:
            y = P.se_layer(y, bp["se_r"], bp["se_e"])
        y = nn.hardswish(P.conv(y, bp["pw"]))
    y = jnp.mean(y, axis=(1, 2), keepdims=True)
    y = nn.hardswish(P.conv(y, params["head_conv"]))
    y = y * 0.8  # exported dropout scale (model.cpp:219)
    y = y.reshape(y.shape[0], 1280)
    logits = P.linear(y, params["fc"])
    return jax.nn.softmax(logits, axis=-1)


def postprocess(probs, cfg: LcnetCfg):
    p = np.asarray(probs)
    return [(int(np.argmax(p[i])), float(np.max(p[i])))
            for i in range(p.shape[0])]


for _variant in ("doc_ori", "table_cls", "textline_ori"):
    register(ModelDef(
        name=f"pp_lcnet_x1_0_{_variant}",
        build_params=build_params,
        apply=apply,
        default_cfg=(lambda v: (lambda: LcnetCfg(variant=v)))(_variant),
        input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
        postprocess=postprocess,
        doc="PP-LCNet x1.0 classifier (reference: ppocrv5/src/model.cpp:109)",
    ))
