"""Registry targets: names usable in YAML `target:` nodes.

Aliases include the reference's dotted import strings so its YAML files can
be ingested unmodified (SURVEY.md section 5.6).
"""
from __future__ import annotations

from sgam_neurips22_tpu.core.registry import register
from sgam_neurips22_tpu.models.vqgan.model import VQModelConfig
from sgam_neurips22_tpu.training.losses import LossConfig

# DataModule registers itself on import.
import sgam_neurips22_tpu.training.data.datamodule  # noqa: F401


@register(
    "sgam_neurips22_tpu.VQModel",
    "sgam.generative_sensing_module.model.VQModel",  # reference alias
)
def make_vqmodel_config(**params) -> VQModelConfig:
    """YAML node -> VQModelConfig. Parameter arrays are created separately
    via models.init_vqmodel (functional style: config and params never mix)."""
    data_config = params.pop("data_config", None)
    return VQModelConfig.from_config(params, data_config)


@register(
    "sgam_neurips22_tpu.VQLPIPSWithDiscriminator",
    "sgam.generative_sensing_module.modules.losses.vqperceptual.VQLPIPSWithDiscriminator",
)
def make_loss_config(**params) -> LossConfig:
    return LossConfig.from_dict(params)
