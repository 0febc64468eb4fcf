"""Device mesh construction and batch sharding.

The reference's only parallelism is single-host nn.DataParallel
(/root/reference/train.py:182-184) plus manual process sharding of video lists
(SURVEY.md §2.6). Here the equivalent is a jax.sharding.Mesh with a "data"
axis (batch sharded over ICI) and an optional "model" axis (output-channel
tensor parallelism); XLA GSPMD inserts the collectives (psum for gradients,
all-gather for gathered outputs). Multi-host runs initialize
jax.distributed and use the same mesh over the global device set.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model")


def create_mesh(devices=None, *, model: int = 1) -> Mesh:
    """2-D ("data", "model") mesh over all (or the given) devices.

    model=1 is pure data parallelism — the right default for a ~33M-param
    model; the model axis exists so tensor-parallel shardings are a config
    change, not a rewrite.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    arr = np.asarray(devices).reshape(n // model, model)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over "data", rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading batch axis) onto the mesh
    sharded over "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
