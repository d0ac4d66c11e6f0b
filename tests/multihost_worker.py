"""Worker for the light 2-process cluster test (tests/test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Forms a gloo CPU cluster (2 virtual devices per process), then checks the
three multi-host primitives end-to-end on the global mesh:
  - replicate_global: host pytree -> fully-replicated global arrays
  - shard_local_batch: per-process local rows -> one global batch-sharded
    array (each process contributes different data)
  - a jitted SPMD reduction whose result depends on EVERY process's rows
    (proves the cross-process collective actually ran)
Prints 'WORKER_OK <checksum>' on success; the parent asserts both processes
print the same checksum.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from sgam_neurips22_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", nproc, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgam_neurips22_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_mesh()
    ndev = mesh.shape["data"]
    assert ndev == 2 * nproc, ndev

    # replicate: same host value everywhere, readable back locally
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    rep = distributed.replicate_global(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])

    # shard: each process contributes DISTINCT local rows of a global batch
    local_bs = 4  # global batch 8 over 4 devices
    local = {
        "x": np.full((local_bs, 3), float(pid + 1), np.float32),
    }
    batch = distributed.shard_local_batch(local, mesh)
    assert batch["x"].shape == (local_bs * nproc, 3)

    # SPMD reduction over the global batch: value requires both processes'
    # rows (1.0-rows from p0 and 2.0-rows from p1 -> sum 4*3*1 + 4*3*2 = 36)
    total = jax.jit(
        lambda b, w: jnp.sum(b) + 0.0 * jnp.sum(w),
        out_shardings=NamedSharding(mesh, P()),
    )(batch["x"], rep["w"])
    expect = 3.0 * local_bs * sum(range(1, nproc + 1))
    got = float(total)
    assert got == expect, (got, expect)
    print(f"WORKER_OK {got}", flush=True)


if __name__ == "__main__":
    main()
