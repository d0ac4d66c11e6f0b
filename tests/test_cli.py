"""CLI smoke tests: train.py end-to-end and evaluate.py over synthetic data.

These run the actual user entry points as subprocesses on the CPU backend —
the 'a reference user can switch over' guarantee.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
}
# the axon sitecustomize registers a remote-TPU PJRT plugin when this var is
# set, and plugin registration can claim the default backend regardless of
# JAX_PLATFORMS — drop it so CLI subprocesses genuinely run on CPU
CPU_ENV.pop("PALLAS_AXON_POOL_IPS", None)


def make_codebook_data(root):
    rng = np.random.default_rng(0)
    scene = os.path.join(root, "train", "scene")
    os.makedirs(scene)
    np.save(os.path.join(root, "K.npy"), np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]]))
    paths = []
    for i in range(4):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scene, f"im_{i:05d}.png"))
        np.save(os.path.join(scene, f"dm_{i:05d}.npy"), rng.uniform(8, 14, (32, 32)).astype(np.float32))
        paths.append(os.path.join(scene, f"im_{i:05d}.png"))
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(paths))
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(paths[:2]))


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    ddir = str(tmp_path / "data")
    os.makedirs(ddir)
    make_codebook_data(ddir)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(f"""
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
      params: {{disc_start: 0, disc_num_layers: 2}}
data:
  target: sgam_neurips22_tpu.DataModule
  params:
    batch_size: 2
    dataset: clevr-infinite
    depth_range: [7, 16]
    phase: codebook
    dataset_dir: {ddir}
    use_depth: true
    image_resolution: [32, 32]
""")
    logdir = str(tmp_path / "logs")
    r = subprocess.run(
        [sys.executable, "train.py", "--base", str(cfg_path), "--no_wandb",
         "--max_steps", "2", "--epochs", "2", "--logdir", logdir, "-n", "smoke"],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    runs = os.listdir(logdir)
    assert len(runs) == 1 and "phase=codebook" in runs[0] and "smoke" in runs[0]
    run = os.path.join(logdir, runs[0])
    assert os.path.exists(os.path.join(run, "config.yaml"))
    metrics = open(os.path.join(run, "metrics.jsonl")).read().splitlines()
    assert any("aeloss" in m for m in metrics)


def test_evaluate_cli(tmp_path):
    rng = np.random.default_rng(1)
    gen = tmp_path / "gen"
    gt = tmp_path / "gt"
    os.makedirs(gen)
    os.makedirs(gt)
    for i in range(3):
        a = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        noise = rng.normal(0, 10, (32, 32, 3))
        b = np.clip(a + noise, 0, 255).astype(np.uint8)
        Image.fromarray(a).save(gen / f"im_{i:05d}.png")
        Image.fromarray(b).save(gt / f"im_{i:05d}.png")
    r = subprocess.run(
        [sys.executable, "evaluate.py", str(gen), str(gt)],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout)
    assert out["n_frames"] == 3
    assert 20 < out["psnr"] < 40
    assert 0 < out["ssim"] <= 1


def test_generate_cli_smoke(tmp_path):
    """Run the scene-generation CLI end-to-end (tiny model via a
    reference-schema trained-model YAML, real template-file layout):
    frames + point clouds must land on disk in the reference layout."""
    tdir = tmp_path / "templates"
    os.makedirs(tdir)
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(img).save(tdir / "im_00000_00_00.png")
    # CLEVR templates carry RAY depth (generate.py converts to z)
    np.save(tdir / "dm_00000_00_00.npy", rng.uniform(8, 14, (64, 64)).astype(np.float32))
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text("""
model:
  target: sgam_neurips22_tpu.VQModel
  params:
    phase: conditional_generation
    embed_dim: 32
    n_embed: 64
    use_extrapolation_mask: true
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
    data_config:
      dataset: clevr-infinite
      depth_range: [7, 16]
""")
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "generate.py", "--dataset", "clevr-infinite",
         "--config", str(cfg_path), "--template_dir", str(tdir),
         "--output_dir", out, "--rows", "2", "--cols", "2",
         "--resolution", "64", "--num_src", "2"],
        # cold-cache XLA compile of the fused unroll can take several
        # minutes on a loaded host; warm runs finish in under a minute
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=840,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out)
    # 2x2 grid: seed + 3 generated frames, each with im/dm/R/t
    assert sum(f.startswith("im_") for f in files) == 4
    assert sum(f.startswith("dm_") for f in files) == 4
    assert "merged_pcds.ply" in files
    depth = np.load(os.path.join(out, sorted(f for f in files if f.startswith("dm_"))[-1]))
    assert depth.shape == (64, 64)
