"""Device mesh + sharding layout.

The reference is strictly single-device (SURVEY §2c); scale here comes
from SPMD over a ``jax.sharding.Mesh`` with XLA-inserted collectives
riding ICI:

 - axis ``data``: batch-sharded inputs (pure data parallelism; gradient
   psum inserted by XLA because params are replicated across it)
 - axis ``model``: tensor parallelism over the vocabulary dimension —
   the decoder's output projection and embedding table are the only
   weights that grow with vocab (~10k x 512), so they shard over
   ``model`` and XLA all-gathers logits at the loss.

On one real chip the mesh is (1, 1) and everything below is a no-op;
tests use an 8-device virtual CPU mesh.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """Create a (data, model) mesh over the given or all devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, ("data", "model"))


def make_data_mesh(batch_size, devices=None):
    """Pure-DP mesh over the most devices that divide batch_size."""
    if devices is None:
        devices = jax.devices()
    n_data = 1
    for d in range(len(devices), 0, -1):
        if batch_size % d == 0:
            n_data = d
            break
    return make_mesh(n_data=n_data, n_model=1, devices=devices)


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, ndim=1):
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh):
    """Device-put a pytree/dict of host arrays batch-sharded on axis 0."""
    def put(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return x

    if isinstance(batch, dict):
        return type(batch)({k: put(v) for k, v in batch.items()})
    return jax.tree_util.tree_map(put, batch)


def decoder_param_specs(decoder_params):
    """PartitionSpec tree for a decoder: vocab-dim tensor parallelism.

    embedding (V, E) shards V over 'model'; the output projection
    (H, V) shards V over 'model'; other weights replicate.
    """
    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "embedding" in keys:
            return P("model", None)
        if "linear" in keys or "fc" in keys:
            if getattr(leaf, "ndim", 0) == 2:
                return P(None, "model")
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, decoder_params)


def param_sharding(tree_specs, mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), tree_specs,
        is_leaf=lambda x: isinstance(x, P))
