"""Device-mesh and sharding utilities.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``p2pHD/models/models.py:22-23``): replicate the module, scatter the batch,
gather losses. The TPU-native equivalent is SPMD data parallelism: one jitted
program, a 1-D (or 2-D) :class:`jax.sharding.Mesh` over ICI, the batch dim
sharded across the ``data`` axis, parameters replicated, and loss/grad
reductions compiled to ``psum`` by XLA — no host gathers in the step
(SURVEY.md §2.5).

These helpers centralize mesh construction and NamedSharding creation so every
engine (CycleGAN/p2pHD train steps, batch inference) shards the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    By default a 1-D data-parallel mesh over all devices. Pass ``shape`` and
    ``axis_names`` for 2-D layouts (e.g. ``("data", "model")``).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis mesh")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS) -> NamedSharding:
    """NamedSharding that splits dim 0 (batch) across ``axis``, replicating the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a pytree of host arrays on device, batch-sharded along dim 0."""

    def _put(x):
        sh = NamedSharding(mesh, P(*([axis] + [None] * (x.ndim - 1))))
        return jax.device_put(x, sh)

    return jax.tree.map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad dim 0 of every array so it divides the mesh size; returns (batch, n_pad).

    Keeps shapes static under jit across the dataset tail.
    """

    def _pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width, mode="edge")

    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0] if leaves else 0
    return jax.tree.map(_pad, batch), (-n) % multiple
