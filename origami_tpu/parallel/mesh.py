"""Device mesh construction.

The reference scales by forking OS processes per page
(origami/batch/core/processor.py:482-507); here scale-out is a
`jax.sharding.Mesh` with a data axis (page/tile/line batches) and a
model axis (tensor-sharded channels / ensemble members), and XLA
inserts the collectives.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_parallel=1, axis_names=("data", "model")):
    """Build a (data x model) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError("%d devices not divisible by model_parallel=%d"
                         % (n, model_parallel))
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def data_sharding(mesh, ndim=1):
    """Shard the leading (batch) axis over the data axis."""
    spec = [None] * ndim
    spec[0] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a pytree of arrays with leading batch dims onto the mesh.

    Arrays whose leading dim doesn't divide the data axis are replicated
    (correct, just not sharded) instead of raising."""
    n_data = mesh.shape.get("data", 1)

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % n_data == 0:
            return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, replicated(mesh))
    return jax.tree.map(put, batch)
