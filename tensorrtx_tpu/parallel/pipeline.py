"""Pipeline parallelism across mesh subsets: different engines on
different chips, overlapped by async dispatch.

The reference's multi-engine apps run every engine on the same GPU
sequentially (ppocr_system.cpp: det, then cls, then rec per image). On a
multi-chip TPU host the natural pipeline is one engine per device group:
stage k's jitted program lives on its own chips, and because JAX dispatch
is asynchronous, submitting batch i+1 to stage 0 while stage 1 still works
on batch i overlaps the stages with no stream/event code — the host loop
below IS the pipeline schedule.

This is the `pp` axis of the framework's parallelism story (dp/tp:
sharding.py `sharded_serving_step`; sp: `spatial_sharded_apply`).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax

__all__ = ["EnginePipeline", "split_devices"]


def split_devices(n_stages: int, devices=None) -> List[List]:
    """Partition the host's devices into contiguous per-stage groups."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_stages, (len(devs), n_stages)
    per = len(devs) // n_stages
    return [devs[i * per:(i + 1) * per] for i in range(n_stages)]


class EnginePipeline:
    """stages: list of (engine-like callable, device group).

    Each stage is jitted onto its group's first device (or a caller-built
    sharded step for a whole group). `run(batches)` feeds every batch
    through all stages; stage s of batch i executes concurrently with
    stage s-1 of batch i+1 because results are only materialized at the
    end (async dispatch — the TPU analog of the reference's per-stream
    enqueue pipelining).
    """

    def __init__(self, stages: Sequence[tuple]):
        self._stages = []
        for fn, devs in stages:
            dev = devs[0] if isinstance(devs, (list, tuple)) else devs
            self._stages.append((fn, dev))

    def run(self, batches, to_host: Callable = None):
        outs = []
        for x in batches:
            for fn, dev in self._stages:
                x = fn(jax.device_put(x, dev))
            outs.append(x)
        jax.block_until_ready(outs)
        return [to_host(o) if to_host else o for o in outs]
