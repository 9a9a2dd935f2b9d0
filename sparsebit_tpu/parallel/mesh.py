"""Mesh construction + data-parallel helpers."""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp=1, tp=1, devices=None):
    """Mesh(('dp','tp')) over the available devices (ICI within a slice)."""
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), "need {} devices, have {}".format(
        dp * tp, len(devices)
    )
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def make_mesh_named(devices=None, **axes):
    """Mesh with arbitrary named axes, e.g. make_mesh_named(dp=2, pp=4)."""
    devices = devices if devices is not None else jax.devices()
    n = 1
    for v in axes.values():
        n *= v
    assert n <= len(devices), "need {} devices, have {}".format(n, len(devices))
    grid = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(grid, tuple(axes.keys()))


def dp_shard_batch(mesh, x):
    """Place a batch leading-axis-sharded over dp, replicated over tp."""
    return jax.device_put(x, NamedSharding(mesh, P("dp")))


def replicate(mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))
