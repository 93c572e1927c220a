from .mesh import make_mesh, shard_env_batch, replicate
