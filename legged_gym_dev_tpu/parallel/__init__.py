from .mesh import make_host_mesh, make_mesh, replicate, shard_batch

__all__ = ["make_host_mesh", "make_mesh", "replicate", "shard_batch"]
