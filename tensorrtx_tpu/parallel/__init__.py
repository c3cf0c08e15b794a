from tensorrtx_tpu.parallel.gpipe import gpipe_apply, shard_stage_params
from tensorrtx_tpu.parallel.pipeline import EnginePipeline, split_devices
from tensorrtx_tpu.parallel.sharding import (make_mesh, shard_engine,
                                             sharded_serving_step,
                                             spatial_sharded_apply)

__all__ = ["make_mesh", "shard_engine", "sharded_serving_step",
           "spatial_sharded_apply", "EnginePipeline", "split_devices",
           "gpipe_apply", "shard_stage_params"]
