"""Parameter sharding rules (GSPMD tensor parallelism).

Model parameters are sharded by simple pattern rules over the pytree:
conv kernels (H, W, Cin, Cout) and dense kernels (..., Cout) split their
output-channel axis over the mesh "model" axis when divisible; everything
else is replicated. Given these shardings on inputs/outputs of a jitted
step, XLA GSPMD inserts the all-gathers/reduce-scatters — no hand-written
collectives in the training code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def param_spec(path, x, model_axis_size):
    shape = np.shape(x)
    if len(shape) >= 2 and shape[-1] % max(model_axis_size, 1) == 0 \
            and shape[-1] >= 2 * model_axis_size:
        spec = [None] * (len(shape) - 1) + ["model"]
        return P(*spec)
    return P()


def shard_params(mesh, params):
    """Apply the rules and device_put the parameter pytree."""
    model_axis = mesh.shape.get("model", 1)

    def put(path, x):
        return jax.device_put(
            x, NamedSharding(mesh, param_spec(path, x, model_axis)))
    return jax.tree_util.tree_map_with_path(put, params)


def param_shardings(mesh, params):
    """The NamedShardings (not the data) for in_shardings declarations."""
    model_axis = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh, param_spec(path, x, model_axis)),
        params)
