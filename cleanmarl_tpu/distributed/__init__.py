from cleanmarl_tpu.distributed.dp import make_mesh, shard_runner, replicate

__all__ = ["make_mesh", "shard_runner", "replicate"]
