from tensorrtx_tpu.parallel.pipeline import EnginePipeline, split_devices
from tensorrtx_tpu.parallel.sharding import (make_mesh, shard_engine,
                                             sharded_serving_step,
                                             spatial_sharded_apply)

__all__ = ["make_mesh", "shard_engine", "sharded_serving_step",
           "spatial_sharded_apply", "EnginePipeline", "split_devices"]
