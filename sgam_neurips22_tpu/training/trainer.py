"""Training orchestrator: the Lightning-Trainer replacement.

Rebuild of the reference train harness (train_generative_sensing_model.py:
10-242 + the callbacks in data/utils/utils.py): config-driven model/data
construction, LR scaling base_lr * accum * global_batch (:196-201; the
reference's `ngpu * bs` product IS the global batch since its bs is per-rank),
data-parallel mesh instead of DDP (:71), step-interval + top-k checkpoints,
emergency checkpoint on SIGUSR1/SIGTERM/crash (:204-225), periodic image
grids + metric logs, validation each epoch, online-kmeans refresh trigger.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from sgam_neurips22_tpu.core.checkpoint import (
    CheckpointManager,
    install_signal_checkpoint,
)
from sgam_neurips22_tpu.core.config import ConfigDict, save_yaml
from sgam_neurips22_tpu.core.torch_convert import convert_checkpoint, init_from_ckpt
from sgam_neurips22_tpu.models.vqgan.model import VQModelConfig
from sgam_neurips22_tpu.parallel.distributed import (
    is_primary,
    replicate_global,
    shard_local_batch,
)
from sgam_neurips22_tpu.parallel.mesh import make_mesh
from sgam_neurips22_tpu.training.data.datamodule import DataModule
from sgam_neurips22_tpu.training.kmeans import refresh_codebook, should_refresh
from sgam_neurips22_tpu.training.lpips import init_lpips
from sgam_neurips22_tpu.training.losses import LossConfig
from sgam_neurips22_tpu.training.train_step import (
    OnlineKMeansConfig,
    SchedulerConfig,
    TrainConfig,
    create_train_state,
    eval_step,
    train_step,
)
from sgam_neurips22_tpu.utils.logging import ImageLogger, MetricLogger


def monitor_improves(val: float, kept: list, mode: str, top_k: int = 3) -> bool:
    """Host-side top-k candidate gate: would `val` enter the kept top-k?
    (Only then is the ~1 GB device->host state fetch for a best-checkpoint
    save worth paying.) `mode` follows the reference ModelCheckpoint:
    'min' keeps the smallest values, 'max' the largest."""
    if len(kept) < top_k:
        return True
    return val < max(kept) if mode == "min" else val > min(kept)


def train_config_from_yaml(cfg: ConfigDict) -> TrainConfig:
    """Build TrainConfig from a reference-schema YAML tree."""
    mp = cfg.model.params
    dp = cfg.data.params
    model_cfg = VQModelConfig.from_config(mp, dp)
    loss_cfg = LossConfig.from_dict(dict(mp.lossconfig.params))
    km = OnlineKMeansConfig.from_dict(
        dict(mp.get("online_kmeans_config") or {})
    )
    sched = SchedulerConfig.from_dict(dict(mp.get("lr_scheduler_config") or {}))
    return TrainConfig(
        model=model_cfg,
        loss=loss_cfg,
        learning_rate=float(cfg.model.get("base_learning_rate", 4.5e-6)),
        online_kmeans=km,
        lr_scheduler=sched,
    )


class Trainer:
    def __init__(
        self,
        cfg: ConfigDict,
        logdir: str,
        seed: int = 23,
        n_devices: Optional[int] = None,
        accumulate_grad_batches: int = 1,
        use_wandb: bool = True,
        lpips_weights: Optional[str] = None,
        max_steps: Optional[int] = None,
        install_signals: bool = True,
    ):
        self.cfg = cfg
        self.logdir = logdir
        self.max_steps = max_steps
        # host-side side effects (logs, config snapshots) belong
        # to process 0 — the reference's rank_zero_only discipline
        self._primary = is_primary()
        os.makedirs(logdir, exist_ok=True)
        if self._primary:
            # config snapshot (reference SetupCallback, data/utils/utils.py:314-346)
            save_yaml(cfg, os.path.join(logdir, "config.yaml"))

        import math

        nproc = jax.process_count()
        bs = int(cfg.data.params.batch_size)
        self.mesh = make_mesh(n_devices)
        ndev = self.mesh.shape["data"]
        if bs % ndev != 0:
            if nproc > 1:
                # a multi-host mesh cannot silently shrink (every process's
                # local chips must stay in the mesh)
                raise ValueError(
                    f"batch_size {bs} must be divisible by the {ndev}-device "
                    f"global mesh ({nproc} processes)"
                )
            # the global batch must shard evenly over 'data'
            ndev = math.gcd(bs, ndev)
            print(
                f"batch_size {bs} not divisible by {self.mesh.shape['data']} "
                f"devices; using a {ndev}-device data mesh"
            )
            self.mesh = make_mesh(ndev)

        base = train_config_from_yaml(cfg)
        # LR scaling (reference train_generative_sensing_model.py:196-201):
        # lr = accum x ngpu x per_gpu_bs x base. The reference's bs is
        # per-rank (each DDP rank gets its own DataLoader of size bs); here
        # `bs` is the GLOBAL batch sharded over the mesh, so the device
        # count is already inside it — scale by the global batch exactly once.
        lr = accumulate_grad_batches * bs * base.learning_rate
        self.train_cfg = TrainConfig(
            model=base.model, loss=base.loss, learning_rate=lr,
            online_kmeans=base.online_kmeans,
            accumulate_grad_batches=accumulate_grad_batches,
            lr_scheduler=base.lr_scheduler,
        )
        print(
            f"lr = {lr:.3e} = {accumulate_grad_batches} (accum) x {bs} "
            f"(global batch = {ndev} dev x {bs // ndev}) x {base.learning_rate:.3e}"
        )

        key = jax.random.PRNGKey(seed)
        self.state = create_train_state(key, self.train_cfg)
        # codebook init from a k-means .npy (reference quantize.py:231-235)
        km_path = (cfg.model.params.get("online_kmeans_config") or {}).get(
            "kmean_init_codebook_path"
        )
        if km_path and os.path.exists(km_path):
            from sgam_neurips22_tpu.models.vqgan.quantize import load_codebook_init

            self.state["params"]["quantize"]["embedding"] = load_codebook_init(
                km_path, self.train_cfg.model.n_embed, self.train_cfg.model.embed_dim
            )
            print(f"initialized codebook from {km_path}")
        # cross-phase warm start (reference model.py:27,65-66: ckpt_path with
        # ignore_keys=['loss.discriminator']) — from a reference torch .ckpt
        # OR our own train.py output (orbax run/checkpoints/step dir):
        # shape-mismatched leaves (conv_in 4ch codebook vs 5ch conditional)
        # keep their fresh init, exactly the reference's non-strict load
        ckpt_path = cfg.model.params.get("ckpt_path")
        if ckpt_path and os.path.exists(ckpt_path):
            if os.path.isdir(ckpt_path):
                from sgam_neurips22_tpu.core.checkpoint import (
                    restore_raw_from_path,
                )

                raw = restore_raw_from_path(ckpt_path)
                if not isinstance(raw, dict) or "params" not in raw:
                    raise ValueError(
                        f"no 'params' subtree in checkpoint at {ckpt_path}"
                    )
                self.state["params"] = init_from_ckpt(
                    self.state["params"], raw["params"]
                )
                # the discriminator is deliberately NOT grafted — the
                # reference's warm start drops it (ignore_keys=
                # ['loss.discriminator']) and the torch branch below
                # matches; both formats must behave identically
            else:
                model_np, disc_np, _ = convert_checkpoint(ckpt_path)
                self.state["params"] = init_from_ckpt(self.state["params"], model_np)
            print(f"warm-started model weights from {ckpt_path}")

        if lpips_weights and os.path.exists(lpips_weights):
            import pickle

            with open(lpips_weights, "rb") as f:
                self.lpips_params = pickle.load(f)
            print(f"loaded LPIPS weights from {lpips_weights}")
        else:
            self.lpips_params = init_lpips(jax.random.PRNGKey(1))
            if self.train_cfg.loss.perceptual_weight > 0:
                print(
                    "WARNING: using randomly initialized LPIPS backbone "
                    "(convert torchvision VGG16 via tools/convert_lpips.py "
                    "for reference-parity perceptual loss)"
                )

        self.state = replicate_global(self.state, self.mesh)
        self.lpips_params = replicate_global(self.lpips_params, self.mesh)

        self.data = DataModule(
            device_put=lambda b: shard_local_batch(b, self.mesh),
            process_count=nproc,
            process_index=jax.process_index(),
            **{k: v for k, v in cfg.data.params.items()},
        )
        self.metrics = MetricLogger(
            logdir, use_wandb=use_wandb and self._primary
        )
        self.images = ImageLogger(logdir, wandb_run=self.metrics.wandb)
        self.ckpt = CheckpointManager(
            os.path.join(logdir, "checkpoints"), save_interval_steps=10_000
        )
        # top-k by monitored val metric (reference ModelCheckpoint,
        # train CLI :124-140; monitor defaults to val/rec_loss)
        self.monitor = cfg.model.params.get("monitor", "val/rec_loss")
        # direction of the monitored metric; the reference's ModelCheckpoint
        # defaults to mode="min" (all its monitors are losses) but accepts
        # either — a "max" monitor (e.g. PSNR) must not silently stop saving
        self.monitor_mode = str(cfg.model.params.get("monitor_mode", "min"))
        if self.monitor_mode not in ("min", "max"):
            raise ValueError(f"monitor_mode must be 'min' or 'max', got {self.monitor_mode!r}")
        self.best_ckpt = CheckpointManager(
            os.path.join(logdir, "checkpoints_best"),
            save_interval_steps=1,
            max_to_keep=3,
            monitor=self.monitor,
            best_mode=self.monitor_mode,
        )
        # top-k gate values persist next to the checkpoints: a restarted run
        # must not re-pay the ~1 GB device fetch for non-improving
        # validations (the in-memory gate alone resets on resume)
        # (kept OUTSIDE the orbax directory: orbax scans its root for step
        # dirs and should not see foreign files)
        self._best_vals_path = os.path.join(logdir, "best_vals.json")
        self._best_vals: list = []
        try:
            # reconcile with the directory: a wiped/empty checkpoints_best
            # must not leave stale JSON values permanently gating saves
            if self.best_ckpt.latest_step() is not None:
                with open(self._best_vals_path) as f:
                    self._best_vals = sorted(
                    json.load(f), reverse=self.monitor_mode == "max"
                )[:3]
        except (OSError, ValueError):
            pass
        if install_signals:
            # every process installs the handler: preemption signals all
            # hosts, and the multi-process emergency path below is
            # coordination-free (orbax barriers would deadlock if a peer
            # is already dead)
            install_signal_checkpoint(self._emergency_save)
        self._kmeans_key = jax.random.PRNGKey(seed + 7)

    # ------------------------------------------------------------------
    def _emergency_save(self) -> None:
        """Must never raise: it runs from signal handlers and crash paths."""
        try:
            step = int(self.state["step"])
            if jax.process_count() > 1:
                # orbax saves are cooperative (every process must enter the
                # same barriers) — in an emergency the peers may already be
                # dead or stuck, so process 0 writes a coordination-free
                # pickle instead; resume() prefers it when it is newer than
                # the orbax latest
                if not self._primary:
                    return
                import pickle

                path = os.path.join(self.logdir, "emergency_state.pkl")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(jax.device_get(self.state), f)
                os.replace(tmp, path)
                print(f"emergency pickle at step {step}: {path}")
                return
            if self.ckpt.latest_step() == step:
                # the save for this step may still be committing
                # asynchronously — finalize it before declaring safety
                self.ckpt.wait()
                return
            self.ckpt.save(step, jax.device_get(self.state), force=True)
            self.ckpt.wait()
        except Exception as e:  # pragma: no cover - best effort
            print(f"emergency checkpoint failed: {e}")

    def _load_emergency(self):
        """(step, host_state) from the coordination-free emergency pickle,
        or None."""
        path = os.path.join(self.logdir, "emergency_state.pkl")
        if not os.path.exists(path):
            return None
        import pickle

        try:
            with open(path, "rb") as f:
                st = pickle.load(f)
            return int(st["step"]), st
        except Exception as e:
            print(f"ignoring unreadable emergency pickle: {e}")
            return None

    def resume(self) -> None:
        latest = self.ckpt.latest_step()
        emergency = self._load_emergency()
        if emergency is not None and (latest is None or emergency[0] > latest):
            self.state = replicate_global(emergency[1], self.mesh)
            print(f"resumed from emergency pickle at step {emergency[0]}")
            return
        if latest is not None:
            self.state = self.ckpt.restore(jax.device_get(self.state), latest)
            self.state = replicate_global(self.state, self.mesh)
            print(f"resumed from step {latest}")

    def _maybe_kmeans_refresh(self, step: int) -> None:
        km = self.train_cfg.online_kmeans
        if not km.do_online_kmeans_clustering or "kmeans" not in self.state:
            return
        ks = self.state["kmeans"]
        if should_refresh(ks, step, km.inactive_threshold, km.frequency, km.start_global_step):
            self._kmeans_key, sub = jax.random.split(self._kmeans_key)
            cb, new_ks = refresh_codebook(
                sub, self.state["params"]["quantize"]["embedding"], ks,
                km.online_kmeans_word_timeout,
            )
            self.state["params"]["quantize"]["embedding"] = cb
            self.state["kmeans"] = new_ks
            print(f"online k-means refresh at step {step}")

    def _step_cfg(self, step: int) -> TrainConfig:
        """Pre-VQ passthrough while step < vq_step_threshold
        (reference model.py:83-85,117)."""
        threshold = self.train_cfg.model.vq_step_threshold
        if threshold and step < threshold:
            from dataclasses import replace

            return replace(self.train_cfg, use_vq=False)
        return self.train_cfg

    def fit(self, epochs: int = 1) -> None:
        try:
            # host-side step mirror: train_step increments state['step'] by
            # exactly 1, so reading the device scalar every iteration (a
            # tunnel round-trip) is pure overhead
            host_step = int(self.state["step"])
            for epoch in range(epochs):
                for batch in self.data.train_loader():
                    step = host_step
                    self._maybe_kmeans_refresh(step)
                    self.state, logs = train_step(
                        self.state, batch, self.lpips_params, self._step_cfg(step)
                    )
                    host_step += 1
                    if step % 50 == 0 and self._primary:
                        logs["lr"] = float(self.train_cfg.lr_at(step))  # LR monitor
                        self.metrics.log(
                            {k: v for k, v in logs.items()}, step
                        )
                    # image grids need host reads of the global batch — a
                    # single-process affordance (multi-host runs rely on the
                    # scalar metrics; panels come from offline evaluate.py)
                    if jax.process_count() == 1 and self.images.should_log(step):
                        self._log_images(batch, "train", step)
                    # label with the POST-step counter so the checkpoint's
                    # label matches its state['step'] (as the emergency and
                    # final saves do). EVERY process calls save: orbax
                    # coordinates multi-process writes internally (process 0
                    # writes; the others join its sync barriers — a
                    # primary-only call would deadlock process 0 in those
                    # barriers). should_save is deterministic across
                    # processes (same directory state on shared storage).
                    if self.ckpt.should_save(host_step):
                        self.ckpt.save(host_step, self._host_state())
                    if self.max_steps and step >= self.max_steps:
                        self.validate()
                        self.test()
                        self._final_save()
                        return
                self.validate()
            self.test()
            self._final_save()
        except BaseException:
            # crash -> emergency checkpoint (reference 'melk', :221-225)
            self._emergency_save()
            raise

    def _host_state(self):
        """device_get of the full train state, memoized per step: through the
        remote-TPU tunnel one fetch is ~minutes for ~1 GB (NOTES.md), and
        end-of-fit would otherwise fetch twice (best save + final save)."""
        step = int(self.state["step"])
        cached = getattr(self, "_host_state_cache", None)
        if cached is None or cached[0] != step:
            self._host_state_cache = (step, jax.device_get(self.state))
        return self._host_state_cache[1]

    def _final_save(self) -> None:
        """Persist the end-of-fit state regardless of the save interval (the
        reference's ModelCheckpoint save_last keeps last.ckpt current), so
        --resume continues from where training actually stopped. Cooperative:
        every process participates (see the interval save in fit())."""
        step = int(self.state["step"])
        if self.ckpt.latest_step() != step:
            self.ckpt.save(step, self._host_state(), force=True)
        self.ckpt.wait()
        self._host_state_cache = None

    def test(self) -> None:
        """Run the test split after fit (reference trainer.test, train CLI
        :227). The reference DataModule serves validation data as the test
        split (data/utils/utils.py:281) and test_step == validation_step
        (model.py:344-354), so this evaluates the test loader (falling back
        to val) with the same val/* metric names."""
        loader = getattr(self.data, "test_loader", None) or self.data.val_loader
        self.validate(loader=loader)

    def validate(self, loader=None) -> None:
        import jax.numpy as jnp

        step = int(self.state["step"])
        agg: Dict[str, list] = {}
        n_embed = self.train_cfg.model.n_embed
        usage = np.zeros(n_embed, np.int64)
        # on-device histogram: val/indices is batch-sharded on a multi-host
        # mesh (host reads would need a gather); bincount under jit yields a
        # replicated, locally-readable result on any mesh
        if not hasattr(self, "_hist_fn"):
            self._hist_fn = jax.jit(
                lambda i: jnp.bincount(i.reshape(-1), length=n_embed)
            )
        hist = self._hist_fn
        n = 0
        for batch in (loader or self.data.val_loader)():
            logs = eval_step(self.state, batch, self.lpips_params, self.train_cfg)
            usage += np.asarray(hist(logs.pop("val/indices")), np.int64)
            for k, v in logs.items():
                agg.setdefault(k, []).append(float(v))
            n += 1
        if n:
            out = {k: float(np.mean(v)) for k, v in agg.items()}
            # codebook-usage telemetry (reference model.py:408-410)
            out["val/codebook_active_percentage"] = float((usage > 0).mean())
            if self._primary:
                self.metrics.log(out, step)
                print({k: round(v, 5) for k, v in out.items()})
            if self.monitor in out and self.best_ckpt.latest_step() != step:
                # host-side top-k candidate gate: orbax handles retention,
                # but a non-candidate save still costs the full device->host
                # state fetch (~1 GB, ~minutes through the remote-TPU
                # tunnel) plus a write. Only fetch when this value would
                # enter the kept top-k. The gate values are bit-identical
                # replicated computations, so every process reaches the same
                # decision and joins the (cooperative, orbax-coordinated)
                # save together.
                vals = self._best_vals
                val = out[self.monitor]
                if monitor_improves(val, vals, self.monitor_mode):
                    self.best_ckpt.save(
                        step, self._host_state(), metrics=out, force=True
                    )
                    self._best_vals = sorted(
                        [*vals, val], reverse=self.monitor_mode == "max"
                    )[:3]
                    if self._primary:
                        try:
                            with open(self._best_vals_path, "w") as f:
                                json.dump(self._best_vals, f)
                        except OSError:
                            pass

    def _log_images(self, batch: Dict[str, Any], split: str, step: int) -> None:
        from sgam_neurips22_tpu.models.conditioning import get_x
        from sgam_neurips22_tpu.models.vqgan.model import forward

        cfg = self.train_cfg
        if cfg.phase == "conditional_generation":
            cond = get_x(batch, cfg.model.dataset, depth_range=cfg.model.depth_range)
            x, x_dst, mask = cond.x, cond.x_dst, cond.extrapolation_mask
        else:
            x = x_dst = batch["image"]
            mask = None
        # respect the pre-VQ passthrough gate (reference log_images routes
        # through encode(), which checks global_step < vq_step_threshold)
        res = forward(
            self.state["params"], cfg.model, x, extrapolation_mask=mask,
            use_vq=self._step_cfg(step).use_vq,
        )
        panels = {
            "warped_input": np.asarray(x[..., :3]),
            "warped_disparity": np.asarray(x[..., 3:]),
            "reconstructions": np.asarray(res.xrec[..., :3]),
            "reconstruction_disparities": np.asarray(res.xrec[..., 3:]),
            "gt_rgb": np.asarray(x_dst[..., :3]),
            "gt_disparity": np.asarray(x_dst[..., 3:]),
        }
        self.images.log(step, split, panels)
