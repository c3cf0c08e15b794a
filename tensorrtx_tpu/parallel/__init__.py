from tensorrtx_tpu.parallel.sharding import (make_mesh, shard_engine,
                                             sharded_serving_step)

__all__ = ["make_mesh", "shard_engine", "sharded_serving_step"]
