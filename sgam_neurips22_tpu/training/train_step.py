"""Two-optimizer GAN training step (jit + data-parallel mesh).

Rebuild of reference VQModel.training_step (model.py:271-342): manual
alternating optimization — (0) autoencoder step with L1+LPIPS+adaptive-GAN
+codebook loss, (1) discriminator hinge step — plus online-k-means
bookkeeping. Both sub-steps live in ONE jitted function; under a data mesh
the batch is sharded and XLA inserts the gradient all-reduces (parallel/mesh).

Phase semantics (reference model.py:296-325, configure_optimizers :412-435):
- 'codebook': input is the RGB-D image itself, all model params train.
- 'conditional_generation': input is the warped conditioning from get_x;
  ONLY the encoder (+conv_in) trains — decoder & codebook stay frozen.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sgam_neurips22_tpu.models.conditioning import get_x
from sgam_neurips22_tpu.models.vqgan.model import (
    VQModelConfig,
    decode_features,
    encode_prequant,
    init_vqmodel,
)
from sgam_neurips22_tpu.models.vqgan.quantize import quantize
from sgam_neurips22_tpu.training.discriminator import init_discriminator
from sgam_neurips22_tpu.training.kmeans import (
    KMeansState,
    init_kmeans_state,
    kmeans_bookkeeping,
)
from sgam_neurips22_tpu.training.losses import (
    LossConfig,
    discriminator_loss,
    generator_loss,
)

TRAINABLE_KEYS = {
    # reference configure_optimizers (model.py:414-427)
    "codebook": (
        "conv_in", "encoder", "decoder", "quant_conv", "post_quant_conv", "quantize",
    ),
    "conditional_generation": ("conv_in", "encoder"),
}


@dataclass(frozen=True)
class OnlineKMeansConfig:
    do_online_kmeans_clustering: bool = False
    start_global_step: int = 0
    online_kmeans_word_timeout: int = 10
    inactive_threshold: float = 0.1
    train_feature_buffer_size: int = 1024
    frequency: int = 1024

    @classmethod
    def from_dict(cls, d: Dict[str, Any] | None) -> "OnlineKMeansConfig":
        if not d:
            return cls()
        known = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class SchedulerConfig:
    """Opt-in LambdaWarmUpCosineScheduler wiring. The reference DEFINES this
    scheduler (lr_scheduler.py:4-33) but never wires it into
    configure_optimizers — constant LR is the parity default; set
    `model.params.lr_scheduler_config` in the YAML to enable it here."""

    warm_up_steps: int = 10_000
    lr_min: float = 0.0
    lr_max: float = 1.0
    lr_start: float = 0.0
    max_decay_steps: int = 1_000_000

    @classmethod
    def from_dict(cls, d: Dict[str, Any] | None):
        if not d:
            return None
        known = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class TrainConfig:
    model: VQModelConfig
    loss: LossConfig
    learning_rate: float = 4.5e-6
    use_vq: bool = True
    online_kmeans: OnlineKMeansConfig = field(default_factory=OnlineKMeansConfig)
    splat_collision: str = "nearest"
    # explicit gradient accumulation (the reference's accumulate_grad_batches
    # only entered the LR formula because of manual optimization,
    # SURVEY.md section 2.10; here it actually accumulates via optax.MultiSteps)
    accumulate_grad_batches: int = 1
    # None = constant LR (reference parity); SchedulerConfig = opt-in
    # warmup-cosine multiplier on learning_rate
    lr_scheduler: Optional[SchedulerConfig] = None

    @property
    def phase(self) -> str:
        return self.model.phase

    def lr_at(self, step) -> Any:
        """Effective LR at a step (for the LR monitor; reference logs per-step
        LR via LearningRateMonitor, train CLI :164-169)."""
        if self.lr_scheduler is None:
            return self.learning_rate
        from sgam_neurips22_tpu.training.lr_schedule import lambda_warmup_cosine

        s = self.lr_scheduler
        sched = lambda_warmup_cosine(
            s.warm_up_steps, s.lr_min, s.lr_max, s.lr_start, s.max_decay_steps
        )
        return self.learning_rate * sched(step)


def split_params(params: Dict[str, Any], phase: str):
    keys = TRAINABLE_KEYS[phase]
    trainable = {k: v for k, v in params.items() if k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return trainable, frozen


def make_optimizers(
    lr: float, accumulate: int = 1, scheduler: Optional[SchedulerConfig] = None
):
    """Adam betas (0.5, 0.9) for both (reference model.py:422,432), with
    optional true gradient accumulation and an optional warmup-cosine LR
    multiplier (SchedulerConfig)."""
    if scheduler is not None:
        from sgam_neurips22_tpu.training.lr_schedule import lambda_warmup_cosine

        mult = lambda_warmup_cosine(
            scheduler.warm_up_steps, scheduler.lr_min, scheduler.lr_max,
            scheduler.lr_start, scheduler.max_decay_steps,
        )
        rate = lambda step: lr * mult(step)
    else:
        rate = lr
    ae = optax.adam(rate, b1=0.5, b2=0.9)
    disc = optax.adam(rate, b1=0.5, b2=0.9)
    if accumulate > 1:
        ae = optax.MultiSteps(ae, every_k_schedule=accumulate)
        disc = optax.MultiSteps(disc, every_k_schedule=accumulate)
    return ae, disc


def create_train_state(
    key: jax.Array, cfg: TrainConfig, latent_positions: int = 256
) -> Dict[str, Any]:
    """State pytree: model params, disc params/state, two optimizer states,
    step counter, kmeans bookkeeping."""
    k_model, k_disc = jax.random.split(key)
    params = init_vqmodel(k_model, cfg.model)
    disc_params, disc_state = init_discriminator(k_disc, cfg.loss.disc_config)
    opt_ae, opt_disc = make_optimizers(
        cfg.learning_rate, cfg.accumulate_grad_batches, cfg.lr_scheduler
    )
    trainable, _ = split_params(params, cfg.phase)
    state: Dict[str, Any] = {
        "params": params,
        "disc_params": disc_params,
        "disc_state": disc_state,
        "opt_ae": opt_ae.init(trainable),
        "opt_disc": opt_disc.init(disc_params),
        "step": jnp.zeros((), jnp.int32),
    }
    if cfg.online_kmeans.do_online_kmeans_clustering:
        state["kmeans"] = init_kmeans_state(
            cfg.model.n_embed,
            cfg.online_kmeans.train_feature_buffer_size,
            latent_positions,
            cfg.model.embed_dim,
            cfg.online_kmeans.online_kmeans_word_timeout,
        )
    return state


def _model_inputs(batch: Dict[str, Any], cfg: TrainConfig):
    """Phase-dependent input construction (reference model.py:296-311)."""
    if cfg.phase == "conditional_generation":
        cond = get_x(
            batch,
            cfg.model.dataset,
            depth_range=cfg.model.depth_range,
            collision=cfg.splat_collision,
        )
        return cond.x, cond.x_dst, cond.extrapolation_mask
    x = batch["image"]
    return x, x, None


def _ae_loss_fn(
    trainable, frozen, disc_params, disc_state, lpips_params,
    x, x_dst, mask, step, cfg: TrainConfig,
):
    params = {**trainable, **frozen}
    pre_quant = encode_prequant(params, cfg.model, x, mask)
    if cfg.use_vq:
        q = quantize(params["quantize"]["embedding"], pre_quant, cfg.model.beta)
        latents, qloss, indices = q.z_q, q.loss, q.indices
    else:
        latents, qloss = pre_quant, jnp.zeros((), pre_quant.dtype)
        indices = jnp.zeros(pre_quant.shape[:3], jnp.int32)
    h_pre = decode_features(params, cfg.model, latents)
    loss, xrec, log = generator_loss(
        x_dst, h_pre, params["decoder"]["conv_out"], qloss, step,
        disc_params, disc_state, lpips_params, cfg.loss,
    )
    return loss, (xrec, indices, pre_quant, log)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(
    state: Dict[str, Any],
    batch: Dict[str, Any],
    lpips_params: Optional[Dict[str, Any]],
    cfg: TrainConfig,
) -> Tuple[Dict[str, Any], Dict[str, jnp.ndarray]]:
    """One full training step (AE update + discriminator update)."""
    step = state["step"]
    x, x_dst, mask = _model_inputs(batch, cfg)
    opt_ae, opt_disc = make_optimizers(
        cfg.learning_rate, cfg.accumulate_grad_batches, cfg.lr_scheduler
    )

    # ---- optimizer 0: autoencoder (reference model.py:327-334)
    trainable, frozen = split_params(state["params"], cfg.phase)
    (ae_loss, (xrec, indices, pre_quant, ae_log)), grads = jax.value_and_grad(
        _ae_loss_fn, has_aux=True
    )(
        trainable, frozen, state["disc_params"], state["disc_state"],
        lpips_params, x, x_dst, mask, step, cfg,
    )
    updates, new_opt_ae = opt_ae.update(grads, state["opt_ae"], trainable)
    trainable = optax.apply_updates(trainable, updates)
    params = {**trainable, **frozen}

    # ---- optimizer 1: discriminator (reference model.py:336-340)
    def disc_loss_fn(disc_params):
        d_loss, new_disc_state, d_log = discriminator_loss(
            x_dst, xrec, step, disc_params, state["disc_state"], cfg.loss
        )
        return d_loss, (new_disc_state, d_log)

    (d_loss, (new_disc_state, d_log)), d_grads = jax.value_and_grad(
        disc_loss_fn, has_aux=True
    )(state["disc_params"])
    d_updates, new_opt_disc = opt_disc.update(
        d_grads, state["opt_disc"], state["disc_params"]
    )
    disc_params = optax.apply_updates(state["disc_params"], d_updates)

    new_state = {
        "params": params,
        "disc_params": disc_params,
        "disc_state": new_disc_state,
        "opt_ae": new_opt_ae,
        "opt_disc": new_opt_disc,
        "step": step + 1,
    }
    if "kmeans" in state:
        new_state["kmeans"] = kmeans_bookkeeping(
            KMeansState(*state["kmeans"]) if not isinstance(state["kmeans"], KMeansState) else state["kmeans"],
            indices[0],
            pre_quant[0],
            cfg.online_kmeans.online_kmeans_word_timeout,
        )

    logs = {"aeloss": ae_loss, "discloss": d_loss}
    logs.update({f"train/{k}": v for k, v in ae_log.items()})
    logs.update({f"train/{k}": v for k, v in d_log.items()})
    if "kmeans" in new_state:
        logs["train/codebook_active_percentage"] = jnp.mean(
            (new_state["kmeans"].timeout > 0).astype(jnp.float32)
        )
    return new_state, logs


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    state: Dict[str, Any],
    batch: Dict[str, Any],
    lpips_params: Optional[Dict[str, Any]],
    cfg: TrainConfig,
) -> Dict[str, jnp.ndarray]:
    """Validation losses + rgb/disparity L1 (reference evaluation_loop,
    model.py:356-406)."""
    step = state["step"]
    x, x_dst, mask = _model_inputs(batch, cfg)
    trainable, frozen = split_params(state["params"], cfg.phase)
    ae_loss, (xrec, indices, _, ae_log) = _ae_loss_fn(
        trainable, frozen, state["disc_params"], state["disc_state"],
        lpips_params, x, x_dst, mask, step, cfg,
    )
    d_loss, _, d_log = discriminator_loss(
        x_dst, xrec, step, state["disc_params"], state["disc_state"], cfg.loss
    )
    logs = {f"val/{k}": v for k, v in {**ae_log, **d_log}.items()}
    logs["val/aeloss"] = ae_loss
    logs["val/rgb_l1"] = jnp.mean(jnp.abs(xrec[..., :3] - x_dst[..., :3]))
    logs["val/disparity_l1"] = jnp.mean(jnp.abs(xrec[..., 3:] - x_dst[..., 3:]))
    logs["val/indices"] = indices
    return logs
