"""Multi-process (multi-host) runtime: the multi-node-DDP replacement.

The reference trains multi-node via PyTorch-Lightning DDP over NCCL
(train_generative_sensing_model.py:71 forces strategy='ddp'; Lightning
spawns one process per GPU per node). The TPU-native equivalent
(SURVEY.md section 2.10) is `jax.distributed.initialize` + ONE global
1-D data mesh over every chip of every host: each process addresses its
local chips, parameters are replicated, the global batch is sharded, and
XLA emits the gradient all-reduce over ICI/DCN — no user-level
collectives and no per-rank divergence (the k-means refresh runs the
same deterministic computation on every process).

Data loading follows the same SPMD discipline as the reference's
DistributedSampler: every process derives the SAME epoch-seeded global
index order, then decodes only its `process_index`-th slice of each
global batch; `shard_local_batch` assembles the global device array from
those per-process slices (`jax.make_array_from_process_local_data`).

Single-process runs are the common case: every helper degrades to a
no-op / plain device_put, so call sites need no branching.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the multi-process runtime. Call before the first jax
    backend use. Arguments fall back to SGAM_COORDINATOR / SGAM_NUM_PROCESSES
    / SGAM_PROCESS_ID env vars, then to jax's own auto-detection (TPU pod
    metadata / cluster env). No-op when neither flags nor env request
    multi-process.
    """
    coordinator = coordinator or os.environ.get("SGAM_COORDINATOR")
    if num_processes is None and "SGAM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SGAM_NUM_PROCESSES"])
    if process_id is None and "SGAM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SGAM_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return
    # NOTE: do not touch jax.default_backend() here — it would initialize
    # the backend before jax.distributed does, which breaks cluster setup.
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        # CPU cross-process collectives need an explicit implementation
        # (virtual test meshes; a real pod uses ICI/DCN and ignores this)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        # a loaded/oversubscribed host can take minutes to bring every
        # process up (cold imports compete for cores); the default 300 s
        # RegisterTask deadline is too tight there and harmless to raise
        initialization_timeout=int(
            os.environ.get("SGAM_DIST_INIT_TIMEOUT", "900")
        ),
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, metric/image logs, config snapshots) — the reference's
    rank_zero_only equivalent."""
    return jax.process_index() == 0


def shard_local_batch(batch: Any, mesh, axis: str = "data") -> Any:
    """Assemble global batch-sharded device arrays from this process's
    LOCAL rows (each leaf's leading dim is global_bs / process_count).
    Single-process: identical to mesh.shard_batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch
    )


def replicate_global(tree: Any, mesh) -> Any:
    """Replicate host values onto every device of a (possibly multi-host)
    mesh. All processes must pass the same values (they do: model init and
    checkpoint restores are seed/file-deterministic)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, jax.numpy.asarray(x)
        ),
        tree,
    )
