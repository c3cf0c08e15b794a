"""Quantization context threaded through ops.nn.conv2d by trace order.

The reference's INT8 path (yolo11/src/calibrator.cpp Int8EntropyCalibrator2)
feeds calibration batches to TensorRT, which observes per-tensor activation
histograms and emits a scale table. Here the same contract is functional:

- tap mode: every conv2d records a statistic of its input (absmax or a fixed
  -range histogram) as an auxiliary traced output; conv order is the stable
  layer identity (XLA traces deterministically).
- quant mode: conv2d consumes per-layer activation scales + per-channel
  weight scales by the same ordering and runs the int8 MXU path.
"""

from __future__ import annotations

import contextlib
from typing import List, Optional

STATE: Optional["QuantState"] = None

# When set (core/quant._conv_weights), conv-weight rearrangement builders
# append the ORIGINAL HWIO weight here so phase-space convs (conv2d_s2dh /
# conv2d_s2dh_exit inside model.apply) keep the same trace-order position
# in the scale table as plain nn.conv2d calls.
WEIGHT_SPY: Optional[List] = None


def spy_weight(w) -> None:
    if WEIGHT_SPY is not None:
        import numpy as np

        WEIGHT_SPY.append(np.asarray(w))


class QuantState:
    def __init__(self, mode: str, act_scales=None, w_scales=None,
                 hist_ranges=None, hist_bins: int = 2048, wq=None):
        self.mode = mode            # "tap_absmax" | "tap_hist" | "quant"
        self.taps: List = []
        self.act_scales = act_scales
        self.w_scales = w_scales
        self.wq = wq                # pre-quantized int8 weights, trace order
        self.hist_ranges = hist_ranges
        self.hist_bins = hist_bins
        self.idx = 0

    def next_idx(self) -> int:
        i = self.idx
        self.idx += 1
        return i


@contextlib.contextmanager
def quant_context(state: QuantState):
    global STATE
    prev = STATE
    STATE = state
    try:
        yield state
    finally:
        STATE = prev
