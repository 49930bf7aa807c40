from voicepuppet_tpu.parallel.mesh import (make_mesh, data_parallel_step,
                                           shard_batch, shard_batch_local,
                                           local_batch_rows, replicate)

__all__ = ["make_mesh", "data_parallel_step", "shard_batch",
           "shard_batch_local", "local_batch_rows", "replicate"]
