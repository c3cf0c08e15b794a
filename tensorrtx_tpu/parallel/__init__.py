from tensorrtx_tpu.parallel.gpipe import (gpipe_apply, gpipe_serving_step,
                                          shard_stage_params)
from tensorrtx_tpu.parallel.pipeline import EnginePipeline, split_devices
from tensorrtx_tpu.parallel.sharding import (MeshServingPipeline,
                                             MeshTaskPipeline, make_mesh,
                                             shard_engine,
                                             sharded_serving_step,
                                             sharding_report,
                                             spatial_sharded_apply)

__all__ = ["make_mesh", "shard_engine", "sharded_serving_step",
           "spatial_sharded_apply", "sharding_report", "MeshServingPipeline",
           "MeshTaskPipeline", "EnginePipeline", "split_devices",
           "gpipe_apply", "gpipe_serving_step", "shard_stage_params"]
