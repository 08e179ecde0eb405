"""Device mesh + sharding helpers.

The reference has no multi-device story beyond vestigial DataParallel
prefixes (SURVEY.md §2.6).  The TPU-native scaling design:

- ``data`` axis: batch / independent-sequence parallelism (grad psum is
  emitted by jit over the sharded batch axis).
- ``space`` axis: spatial sharding of high-resolution activations for
  eval/serving — XLA's SPMD partitioner inserts halo exchanges for the
  convolution windows automatically when inputs carry a NamedSharding on
  H; collectives ride ICI.

Multi-host: call jax.distributed.initialize() before make_mesh(); the
same code path then spans slices (DCN between them).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // space
    if data * space > n:
        raise ValueError(f"mesh {data}x{space} needs {data * space} devices, have {n}")
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def shard_leading_axis(tree, mesh: Mesh, axis: int = 0):
    """Place arrays with the given axis sharded over the data axis."""

    def put(x):
        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_spatial(x, mesh: Mesh, h_axis: int = 1):
    """Shard an activation tensor over the space axis along H."""
    spec = [None] * x.ndim
    spec[h_axis] = "space"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
