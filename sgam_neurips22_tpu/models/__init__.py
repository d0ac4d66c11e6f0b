from sgam_neurips22_tpu.models.conditioning import Conditioning, get_x
from sgam_neurips22_tpu.models.vqgan.autoencoder import DDConfig
from sgam_neurips22_tpu.models.vqgan.model import (
    ForwardResult,
    VQModelConfig,
    decode,
    decode_code,
    decode_features,
    encode_prequant,
    forward,
    get_last_layer,
    init_vqmodel,
)
