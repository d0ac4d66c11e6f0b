"""Compatibility with the reference repo's on-disk artifacts.

These tests read (never copy) the reference checkout when present, proving
that its YAML configs and seed templates are directly consumable.
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def test_reference_yaml_configs_load():
    from sgam_neurips22_tpu.core.config import load_yaml
    from sgam_neurips22_tpu.models.vqgan.model import VQModelConfig
    from sgam_neurips22_tpu.training.losses import LossConfig
    from sgam_neurips22_tpu.training.train_step import OnlineKMeansConfig

    for path, n_embed, phase in [
        ("configs/codebooks/clevr-infinite.yaml", 2048, "codebook"),
        ("configs/conditional_generation/clevr-infinite.yaml", 16384, "conditional_generation"),
        ("configs/codebooks/google_earth_vqgan.yaml", 4096, "codebook"),
        ("configs/conditional_generation/google_earth_vqgan.yaml", 4096, "conditional_generation"),
    ]:
        cfg = load_yaml(os.path.join(REF, path))
        model_cfg = VQModelConfig.from_config(cfg.model.params, cfg.data.params)
        assert model_cfg.n_embed == n_embed
        assert model_cfg.phase == phase
        assert model_cfg.ddconfig.ch == 128
        assert model_cfg.ddconfig.ch_mult == (1, 1, 2, 2, 4)
        loss_cfg = LossConfig.from_dict(dict(cfg.model.params.lossconfig.params))
        assert loss_cfg.disc_start == 10000
        assert loss_cfg.disc_weight == 0.8
        km = OnlineKMeansConfig.from_dict(dict(cfg.model.params.online_kmeans_config))
        if "codebooks/clevr" in path:
            assert km.do_online_kmeans_clustering


def test_reference_target_aliases_resolve():
    import sgam_neurips22_tpu.targets  # noqa: F401
    from sgam_neurips22_tpu.core.config import load_yaml
    from sgam_neurips22_tpu.core.registry import instantiate_from_config

    cfg = load_yaml(os.path.join(REF, "configs/codebooks/clevr-infinite.yaml"))
    loss_cfg = instantiate_from_config(cfg.model.params.lossconfig)
    assert loss_cfg.codebook_weight == 1.0
    model_cfg = instantiate_from_config(cfg.model)
    assert model_cfg.n_embed == 2048


def test_reference_clevr_template_loads():
    import sys

    sys.path.insert(0, "/root/repo")
    from generate import load_seed_frames

    tdir = os.path.join(REF, "templates/clevr-infinite")
    if not os.path.isdir(tdir):
        pytest.skip("no clevr template")
    seeds = load_seed_frames(tdir, "clevr-infinite", 0, (256, 256))
    assert len(seeds) >= 1
    coord, rgb, depth = seeds[0]
    assert rgb.shape == (256, 256, 3)
    assert depth.shape == (256, 256)
    assert -1.0 <= float(rgb.min()) and float(rgb.max()) <= 1.0
    # CLEVR depths are metric z in roughly [7, 16] after ray->z conversion
    assert 5.0 < float(np.median(depth)) < 20.0


def test_reference_google_earth_template_loads():
    import sys

    sys.path.insert(0, "/root/repo")
    from generate import load_seed_frames

    tdir = os.path.join(REF, "templates/google_earth")
    if not os.path.isdir(os.path.join(tdir, "seed0")):
        pytest.skip("no google_earth template")
    seeds = load_seed_frames(tdir, "google_earth", 0, (256, 256))
    coord, rgb, depth = seeds[0]
    assert coord == (0, 0)
    assert rgb.shape == (256, 256, 3)
    assert depth.shape == (256, 256)


def test_reference_lpips_lin_heads_convert():
    vgg_pth = os.path.join(
        REF, "sgam/generative_sensing_module/modules/autoencoder/lpips/vgg.pth"
    )
    if not os.path.exists(vgg_pth):
        pytest.skip("no vgg.pth in reference")
    torch = pytest.importorskip("torch")
    import jax

    from sgam_neurips22_tpu.training.lpips import LPIPS_CHANNELS, init_lpips

    lin_sd = torch.load(vgg_pth, map_location="cpu")
    params = init_lpips(jax.random.PRNGKey(0))
    # graft the real lin heads over the random backbone
    for i, c in enumerate(LPIPS_CHANNELS):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy().transpose(2, 3, 1, 0)
        assert params["lins"][i]["weight"].shape == w.shape
        params["lins"][i]["weight"] = w
    assert params["lins"][0]["weight"].shape == (1, 1, 64, 1)
