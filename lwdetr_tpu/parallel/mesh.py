"""Device mesh and sharding rules.

The reference implements data parallelism with DDP + NCCL
(/root/reference/main.py:206-210, util/misc.py:417-439).  The TPU-native
equivalent is declarative: build a `jax.sharding.Mesh`, annotate the batch
with a `data`-axis sharding and the params as replicated, and let XLA insert
all collectives (gradient reductions ride the ICI automatically under jit).

The mesh reserves a `model` axis so tensor-parallel shardings can be added
without re-plumbing (scaling-book style); all release models fit one chip,
so `model=1` by default.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-local numpy batch pytree onto the mesh, batch-sharded.

    Single-process: device_put with a NamedSharding. Multi-process: each host
    provides its slice of the global batch
    (jax.make_array_from_process_local_data handles assembly).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def zero1_sharding_tree(mesh: Mesh, tree, min_size: int = 16384):
    """ZeRO-1 placement for optimizer/EMA state: shard dim 0 of each large
    leaf over the data axis, replicate the rest.

    Under jit, GSPMD then reduce-scatters gradients into the sharded Adam
    moments and all-gathers the parameter updates — the scaling-book
    recipe, no step-code changes. Per-chip optimizer memory drops ~n_data x
    (xlarge: ~1.9 GB of fp32 m/v/EMA replicated today). Leaves smaller than
    `min_size` or with an indivisible dim 0 stay replicated (the collective
    would cost more than the bytes saved)."""
    n = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        if (getattr(leaf, "ndim", 0) >= 1 and leaf.size >= min_size
                and leaf.shape[0] % n == 0):
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)
