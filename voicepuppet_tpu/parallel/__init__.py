from voicepuppet_tpu.parallel.mesh import (make_mesh, data_parallel_step,
                                           shard_batch, replicate)

__all__ = ["make_mesh", "data_parallel_step", "shard_batch", "replicate"]
