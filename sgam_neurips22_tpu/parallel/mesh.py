"""Device mesh + sharding helpers (the DDP replacement).

The reference trains with PyTorch-Lightning DDP over NCCL
(train_generative_sensing_model.py:71; SURVEY.md section 2.10). Here data
parallelism is a 1-D `jax.sharding.Mesh` over all chips: parameters are
replicated, the batch axis is sharded, and gradient all-reduce is emitted by
XLA (ICI within a slice, DCN across slices) when the jitted train step
produces replicated outputs from sharded inputs — no user-level collectives.

TP/PP/SP/EP are documented non-goals (the model is ~1e8 params; SURVEY.md
section 2.10), but the mesh helpers accept extra axes so a model-parallel
axis can be added without touching call sites.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D data mesh by default; pass axis_names=('data','model') with a
    factorizable device count for 2-D."""
    devices = jax.devices()
    if n_devices is not None:
        if jax.process_count() > 1 and n_devices != len(devices):
            # a prefix of jax.devices() would drop some processes' local
            # chips from the mesh: their make_array_from_process_local_data
            # calls fail (or the cooperative save barriers hang) far from
            # the cause. Multi-host meshes must span every chip.
            raise ValueError(
                f"n_devices={n_devices} on a {jax.process_count()}-process "
                f"cluster with {len(devices)} global devices: multi-host "
                "meshes must use all devices (omit n_devices)"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 unless divisible
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put every leaf with its batch dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_multiple(mesh: Mesh, axis: str = "data") -> int:
    """Global batch size must be a multiple of this."""
    return mesh.shape[axis]
