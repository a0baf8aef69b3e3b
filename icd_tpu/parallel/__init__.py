from .mesh import (  # noqa: F401
    batch_sharding, decoder_param_specs, make_mesh, param_sharding,
    replicated, shard_batch)
