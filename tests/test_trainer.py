"""End-to-end trainer smoke test: config -> Trainer.fit -> checkpoint/resume."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from sgam_neurips22_tpu.core.config import wrap


@pytest.fixture()
def codebook_dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    ddir = tmp_path / "data"
    scene = ddir / "train" / "scene"
    os.makedirs(scene)
    np.save(ddir / "K.npy", np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]]))
    paths = []
    for i in range(8):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(scene / f"im_{i:05d}.png")
        np.save(scene / f"dm_{i:05d}.npy", rng.uniform(8, 14, (32, 32)).astype(np.float32))
        paths.append(str(scene / f"im_{i:05d}.png"))
    (ddir / "train.txt").write_text("\n".join(paths))
    (ddir / "val.txt").write_text("\n".join(paths[:4]))
    return str(ddir)


def make_cfg(dataset_dir):
    return wrap(
        {
            "model": {
                "base_learning_rate": 1e-4,
                "target": "sgam_neurips22_tpu.VQModel",
                "params": {
                    "phase": "codebook",
                    "embed_dim": 32,
                    "n_embed": 32,
                    "use_extrapolation_mask": True,
                    "online_kmeans_config": {
                        "do_online_kmeans_clustering": True,
                        "online_kmeans_word_timeout": 5,
                        "inactive_threshold": 0.5,
                        "train_feature_buffer_size": 2,
                        "frequency": 2,
                    },
                    "ddconfig": {
                        "double_z": False,
                        "z_channels": 32,
                        "resolution": 16,
                        "in_channels": 4,
                        "out_ch": 4,
                        "ch": 32,
                        "ch_mult": [1, 2],
                        "num_res_blocks": 1,
                        "attn_resolutions": [8],
                        "dropout": 0.0,
                    },
                    "lossconfig": {
                        "target": "sgam_neurips22_tpu.VQLPIPSWithDiscriminator",
                        "params": {
                            "disc_start": 0,
                            "disc_num_layers": 2,
                            "disc_weight": 0.8,
                            "codebook_weight": 1.0,
                            "perceptual_weight": 1,
                        },
                    },
                },
            },
            "data": {
                "target": "sgam_neurips22_tpu.DataModule",
                "params": {
                    "batch_size": 2,
                    "dataset": "clevr-infinite",
                    "depth_range": [7, 16],
                    "phase": "codebook",
                    "dataset_dir": dataset_dir,
                    "use_depth": True,
                    "image_resolution": [32, 32],
                },
            },
        }
    )


@pytest.mark.slow
def test_trainer_fit_and_resume(codebook_dataset_dir, tmp_path):
    from sgam_neurips22_tpu.training.trainer import Trainer

    logdir = str(tmp_path / "run")
    cfg = make_cfg(codebook_dataset_dir)
    tr = Trainer(cfg, logdir, use_wandb=False, max_steps=3, install_signals=False)
    tr.fit(epochs=10)
    assert int(tr.state["step"]) >= 3
    # metrics were logged
    lines = open(os.path.join(logdir, "metrics.jsonl")).read().strip().splitlines()
    assert lines
    rec = json.loads(lines[0])
    assert "aeloss" in rec
    # config snapshot written (SetupCallback parity)
    assert os.path.exists(os.path.join(logdir, "config.yaml"))
    # fit persists its final state regardless of the save interval
    # (ModelCheckpoint save_last parity) -> resume continues from there
    assert tr.ckpt.latest_step() == int(tr.state["step"])
    tr._emergency_save()  # idempotent at an already-saved step
    tr2 = Trainer(cfg, logdir, use_wandb=False, max_steps=3, install_signals=False)
    tr2.resume()
    assert int(tr2.state["step"]) == int(tr.state["step"])
    tr.metrics.close()
    tr2.metrics.close()


def test_load_inference_params_from_orbax_run_dir(codebook_dataset_dir, tmp_path):
    """generate.py/serve.py --ckpt must accept our own train.py output: a
    run dir (containing checkpoints/), the checkpoints dir, or one step dir
    — extracting the params subtree of the saved train state."""
    import jax

    from sgam_neurips22_tpu.serving import load_inference_params
    from sgam_neurips22_tpu.training.trainer import Trainer

    logdir = str(tmp_path / "run")
    cfg = make_cfg(codebook_dataset_dir)
    tr = Trainer(cfg, logdir, use_wandb=False, max_steps=2, install_signals=False)
    tr.fit(epochs=10)
    want = jax.device_get(tr.state["params"])
    step = int(tr.state["step"])
    tr.metrics.close()

    flat_want, _ = jax.tree_util.tree_flatten_with_path(want)
    for path in (
        logdir,                                            # run dir
        os.path.join(logdir, "checkpoints"),               # manager root
        os.path.join(logdir, "checkpoints", str(step)),    # single step dir
    ):
        got = load_inference_params(path, params_init=None)
        flat_got, _ = jax.tree_util.tree_flatten_with_path(got)
        assert len(flat_got) == len(flat_want), path
        for (kw, vw), (kg, vg) in zip(flat_want, flat_got):
            assert kw == kg, path
            np.testing.assert_array_equal(np.asarray(vw), np.asarray(vg))

    # with a params_init template, a config/checkpoint mismatch fails at
    # LOAD time (not minutes later inside XLA compile)
    with pytest.raises(ValueError, match="does not match"):
        load_inference_params(logdir, params_init={"bogus": np.zeros((2, 2))})


def test_warm_start_from_orbax_run_dir(codebook_dataset_dir, tmp_path):
    """model.params.ckpt_path accepts our own train.py run dir (the
    reference workflow warm-starts the conditional phase from the codebook
    checkpoint; with this stack that checkpoint is orbax): MODEL params
    graft in non-strictly, the discriminator stays freshly initialized
    (reference ignore_keys=['loss.discriminator'] — both checkpoint
    formats must behave identically)."""
    import jax

    from sgam_neurips22_tpu.training.trainer import Trainer

    logdir = str(tmp_path / "phase1")
    cfg = make_cfg(codebook_dataset_dir)
    tr = Trainer(cfg, logdir, use_wandb=False, max_steps=2, install_signals=False)
    tr.fit(epochs=10)
    want = jax.device_get(tr.state["params"])
    trained_disc = jax.device_get(tr.state["disc_params"])
    tr.metrics.close()

    cfg2 = make_cfg(codebook_dataset_dir)
    cfg2.model.params["ckpt_path"] = logdir
    # a different init seed: grafted leaves must still equal the checkpoint,
    # while the (deliberately ungrafted) discriminator must NOT
    tr2 = Trainer(
        cfg2, str(tmp_path / "phase2"), seed=99, use_wandb=False,
        install_signals=False,
    )
    fg = jax.tree_util.tree_leaves(jax.device_get(tr2.state["params"]))
    fr = jax.tree_util.tree_leaves(want)
    assert len(fg) == len(fr)
    for a, b in zip(fg, fr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    disc2 = jax.tree_util.tree_leaves(jax.device_get(tr2.state["disc_params"]))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(disc2, jax.tree_util.tree_leaves(trained_disc))
    )
    tr2.metrics.close()


def test_resume_prefers_newer_emergency_pickle(codebook_dataset_dir, tmp_path):
    """The multi-process emergency path writes a coordination-free pickle
    (orbax barriers could deadlock against dead peers); resume() must pick
    it up when it is newer than the orbax latest, and ignore it otherwise."""
    import pickle

    import jax

    from sgam_neurips22_tpu.training.trainer import Trainer

    logdir = str(tmp_path / "run")
    cfg = make_cfg(codebook_dataset_dir)
    tr = Trainer(cfg, logdir, use_wandb=False, max_steps=2, install_signals=False)
    tr.fit(epochs=10)
    saved = int(tr.state["step"])
    assert tr.ckpt.latest_step() == saved

    # a NEWER emergency pickle wins over the orbax checkpoint
    host = jax.device_get(tr.state)
    host["step"] = np.asarray(saved + 5, host["step"].dtype)
    with open(os.path.join(logdir, "emergency_state.pkl"), "wb") as f:
        pickle.dump(host, f)
    tr2 = Trainer(cfg, logdir, use_wandb=False, install_signals=False)
    tr2.resume()
    assert int(tr2.state["step"]) == saved + 5

    # an OLDER pickle is ignored in favor of the orbax checkpoint
    host["step"] = np.asarray(saved - 1, host["step"].dtype)
    with open(os.path.join(logdir, "emergency_state.pkl"), "wb") as f:
        pickle.dump(host, f)
    tr3 = Trainer(cfg, logdir, use_wandb=False, install_signals=False)
    tr3.resume()
    assert int(tr3.state["step"]) == saved
    for t in (tr, tr2, tr3):
        t.metrics.close()


def test_registry_targets_resolve():
    import sgam_neurips22_tpu.targets  # noqa: F401
    from sgam_neurips22_tpu.core.registry import get, instantiate_from_config

    assert get("sgam_neurips22_tpu.VQModel")
    assert get("sgam.generative_sensing_module.model.VQModel")
    loss_cfg = instantiate_from_config(
        {
            "target": "sgam_neurips22_tpu.VQLPIPSWithDiscriminator",
            "params": {"disc_start": 5, "disc_weight": 0.8},
        }
    )
    assert loss_cfg.disc_start == 5


def test_lr_scaling_matches_reference_formula(codebook_dataset_dir, tmp_path):
    """lr = accum x global_batch x base, independent of mesh size (the
    reference's accum x ngpu x per_rank_bs x base with global = ngpu x bs,
    train_generative_sensing_model.py:196-201) — and accumulate_grad_batches
    must reach TrainConfig so optax.MultiSteps actually engages."""
    from sgam_neurips22_tpu.training.trainer import Trainer

    cfg = make_cfg(codebook_dataset_dir)
    tr = Trainer(
        cfg, str(tmp_path / "lr_run"), use_wandb=False,
        accumulate_grad_batches=2, install_signals=False,
    )
    bs = int(cfg.data.params.batch_size)
    base = float(cfg.model.base_learning_rate)
    assert tr.train_cfg.learning_rate == pytest.approx(2 * bs * base)
    assert tr.train_cfg.accumulate_grad_batches == 2
    # a 1-device run with the same global batch gets the same LR
    tr1 = Trainer(
        cfg, str(tmp_path / "lr_run1"), use_wandb=False, n_devices=1,
        accumulate_grad_batches=2, install_signals=False,
    )
    assert tr1.train_cfg.learning_rate == pytest.approx(tr.train_cfg.learning_rate)
    tr.metrics.close()
    tr1.metrics.close()


def test_deferred_actions_run_after_save(tmp_path):
    """Signal actions queued while a checkpoint save is in flight execute
    right after that save finalizes (core.checkpoint deferral protocol)."""
    from sgam_neurips22_tpu.core import checkpoint as cp

    ran = []
    mgr = cp.CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    cp._DEFERRED.append(lambda: ran.append("after"))
    mgr.save(0, {"a": np.zeros(2, np.float32)}, force=True)
    assert ran == ["after"]
    assert not cp._DEFERRED
    mgr.wait()
    assert mgr.latest_step() == 0


def test_monitor_improves_gate_both_modes():
    """Host-side best-checkpoint gate must respect the monitor direction
    (a 'max' monitor like PSNR must not silently stop saving after the
    first top-k fills)."""
    from sgam_neurips22_tpu.training.trainer import monitor_improves

    # fills freely below k
    assert monitor_improves(5.0, [], "min")
    assert monitor_improves(5.0, [1.0, 2.0], "max")
    # min: only values under the current worst enter
    assert monitor_improves(1.5, [1.0, 2.0, 3.0], "min")
    assert not monitor_improves(3.5, [1.0, 2.0, 3.0], "min")
    # max: only values over the current worst enter
    assert monitor_improves(2.5, [1.0, 2.0, 3.0], "max")
    assert not monitor_improves(0.5, [1.0, 2.0, 3.0], "max")


def test_monitor_mode_threads_through_trainer(codebook_dataset_dir, tmp_path):
    from sgam_neurips22_tpu.training.trainer import Trainer

    cfg = make_cfg(codebook_dataset_dir)
    cfg.model.params["monitor_mode"] = "max"
    tr = Trainer(cfg, str(tmp_path / "mm"), use_wandb=False, install_signals=False)
    assert tr.monitor_mode == "max"
    tr.metrics.close()

    cfg.model.params["monitor_mode"] = "up"
    with pytest.raises(ValueError, match="monitor_mode"):
        Trainer(cfg, str(tmp_path / "mm2"), use_wandb=False, install_signals=False)
