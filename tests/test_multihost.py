"""Multi-host (multi-process) training: the multi-node-DDP equivalent.

The end-to-end test launches TWO real `train.py` processes that form a
cluster over a localhost coordinator (gloo CPU collectives, 2 virtual
devices per process -> a 4-device global mesh) — the same topology as one
process per TPU host. Reference capability: Lightning DDP multi-node
(train_generative_sensing_model.py:71).
"""
import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from sgam_neurips22_tpu.training.data.datamodule import Loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tests.test_cli import CPU_ENV, make_codebook_data  # noqa: E402


class _IndexDataset:
    """Returns its index + one draw from the per-example rng stream."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        r = rng.integers(0, 1 << 30) if rng is not None else -1
        return {"idx": np.int64(i), "draw": np.int64(r)}


def _collect(loader):
    return [
        {k: np.asarray(v) for k, v in b.items()} for b in loader
    ]


def test_loader_local_slices_partition_global_batch():
    """Two process-sliced loaders must reproduce exactly the single-host
    loader's batches when concatenated — same shuffled order AND the same
    per-global-position rng streams (multi-host training consumes the same
    examples as single-host, just decoded on different hosts)."""
    ds = _IndexDataset(16)
    whole = _collect(Loader(ds, 4, shuffle=True, seed=7, workers=1))
    p0 = _collect(
        Loader(ds, 4, shuffle=True, seed=7, workers=1, process_count=2, process_index=0)
    )
    p1 = _collect(
        Loader(ds, 4, shuffle=True, seed=7, workers=1, process_count=2, process_index=1)
    )
    assert len(whole) == len(p0) == len(p1) == 4
    for w, a, b in zip(whole, p0, p1):
        np.testing.assert_array_equal(w["idx"], np.concatenate([a["idx"], b["idx"]]))
        np.testing.assert_array_equal(w["draw"], np.concatenate([a["draw"], b["draw"]]))


def test_loader_rejects_indivisible_process_count():
    with pytest.raises(ValueError, match="not divisible"):
        Loader(_IndexDataset(8), 3, process_count=2)


TINY_YAML = """
log_keywords: model.params.phase
model:
  base_learning_rate: 1.0e-4
  target: sgam_neurips22_tpu.VQModel
  params:
    phase: codebook
    embed_dim: 32
    n_embed: 32
    use_extrapolation_mask: true
    online_kmeans_config: {{do_online_kmeans_clustering: false}}
    ddconfig:
      double_z: false
      z_channels: 32
      resolution: 16
      in_channels: 4
      out_ch: 4
      ch: 32
      ch_mult: [1, 2]
      num_res_blocks: 1
      attn_resolutions: [8]
      dropout: 0.0
    lossconfig:
      target: sgam_neurips22_tpu.VQLPIPSWithDiscriminator
      # perceptual_weight 0 drops the VGG graph at trace time: this test
      # proves the multi-host harness, not the loss stack, and two
      # concurrent LPIPS compiles swamp a 1-core CI host
      params: {{disc_start: 0, disc_num_layers: 1, perceptual_weight: 0.0}}
data:
  target: sgam_neurips22_tpu.DataModule
  params:
    batch_size: 4
    dataset: clevr-infinite
    depth_range: [7, 16]
    phase: codebook
    dataset_dir: {ddir}
    use_depth: true
    image_resolution: [32, 32]
"""


def test_multihost_cluster_primitives_two_processes():
    """Always-on light cluster test: two real processes form a gloo CPU
    cluster (4-device global mesh) and exercise replicate_global /
    shard_local_batch / a cross-process SPMD reduction (multihost_worker.py).
    Compiles in seconds — the full train.py e2e lives in the gated test
    below."""
    port = 21000 + os.getpid() % 9000

    def launch(pid):
        env = dict(CPU_ENV)
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), "2", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )

    procs = [launch(0), launch(1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i}:\n{outs[i][-3000:]}"
    oks = [
        line for out in outs for line in out.splitlines()
        if line.startswith("WORKER_OK")
    ]
    assert len(oks) == 2 and oks[0] == oks[1], oks


@pytest.mark.skipif(
    not os.environ.get("SGAM_MULTIHOST_E2E"),
    reason="two full concurrent train.py compiles; ~10 min on a 1-core host "
    "— set SGAM_MULTIHOST_E2E=1 to run",
)
def test_multihost_train_cli_two_processes(tmp_path):
    """Two train.py processes, one 4-device global mesh, 2 steps end-to-end.
    Asserts: both exit 0, they agree on one run dir, only process 0 writes
    metrics/config, and the logged losses are finite."""
    ddir = str(tmp_path / "data")
    os.makedirs(ddir)
    make_codebook_data(ddir)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML.format(ddir=ddir))
    logdir = str(tmp_path / "logs")
    port = 20000 + os.getpid() % 10000  # avoid stale-coordinator collisions

    def launch(pid):
        env = {**CPU_ENV, "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
        return subprocess.Popen(
            [
                sys.executable, "train.py", "--base", str(cfg_path),
                "--no_wandb", "--max_steps", "2", "--epochs", "2",
                "--logdir", logdir, "-n", "mh",
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
            ],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )

    procs = [launch(0), launch(1)]
    outs = [None, None]

    def wait(i):
        try:
            # two concurrent CPU compiles of the GAN step contend for the
            # host (CI gives 1 core); generous ceiling, typical ~6 min
            outs[i], _ = procs[i].communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            procs[i].kill()
            outs[i], _ = procs[i].communicate()

    threads = [threading.Thread(target=wait, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i}:\n{outs[i][-3000:]}"

    runs = os.listdir(logdir)
    assert len(runs) == 1, runs  # both processes agreed on process 0's name
    run = os.path.join(logdir, runs[0])
    assert os.path.exists(os.path.join(run, "config.yaml"))
    metrics = open(os.path.join(run, "metrics.jsonl")).read().splitlines()
    assert any("aeloss" in m for m in metrics)
    import json

    for line in metrics:
        for k, v in json.loads(line).items():
            if isinstance(v, float):
                assert np.isfinite(v), (k, v)
