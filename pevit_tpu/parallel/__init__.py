from .mesh import clip_param_specs, make_mesh, replicate, shard_batch, shard_params

__all__ = ["clip_param_specs", "make_mesh", "replicate", "shard_batch", "shard_params"]
