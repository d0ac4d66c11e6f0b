"""Numeric parity of composite blocks vs torch-functional equivalents.

The elementwise/conv primitives are parity-tested in test_vqgan.py; these
tests compose them into whole blocks (ResnetBlock, AttnBlock, a small
Encoder/Decoder) and compare against a torch implementation of the same
architecture spec (GroupNorm(32,1e-6) -> silu -> 3x3 conv ..., single-head
attention with row-major token order), sharing weights through the
torch-name converter. This pins the riskiest conventions: NHWC<->NCHW
reshape order in attention, asymmetric downsample padding, nearest
upsampling, and skip projections.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sgam_neurips22_tpu.core.torch_convert import params_to_state_dict  # noqa: E402
from sgam_neurips22_tpu.models import DDConfig  # noqa: E402
from sgam_neurips22_tpu.models.vqgan.autoencoder import (  # noqa: E402
    apply_decoder,
    apply_encoder,
    init_decoder,
    init_encoder,
)
from sgam_neurips22_tpu.models.vqgan.torch_functional import (  # noqa: E402
    t,
    torch_attn_block,
    torch_decoder,
    torch_encoder,
    torch_resnet_block,
    un_t,
)
from sgam_neurips22_tpu.models.vqgan.nn import (  # noqa: E402
    attn_block,
    init_attn_block,
    init_resnet_block,
    resnet_block,
)

TINY = DDConfig(
    ch=32, out_ch=4, ch_mult=(1, 2), num_res_blocks=1,
    attn_resolutions=(8,), resolution=16, z_channels=32, in_channels=4,
)


def test_resnet_block_parity():
    rng = np.random.default_rng(0)
    p = init_resnet_block(jax.random.PRNGKey(0), 32, 64)
    sd = params_to_state_dict(p)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    ours = np.asarray(resnet_block(jnp.asarray(x), p))
    theirs = un_t(torch_resnet_block(t(x), sd))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_attn_block_parity():
    rng = np.random.default_rng(1)
    p = init_attn_block(jax.random.PRNGKey(1), 64)
    sd = params_to_state_dict(p)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ours = np.asarray(attn_block(jnp.asarray(x), p))
    theirs = un_t(torch_attn_block(t(x), sd))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_full_encoder_parity():
    rng = np.random.default_rng(2)
    p = init_encoder(jax.random.PRNGKey(2), TINY)
    sd = params_to_state_dict(p)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    ours = np.asarray(apply_encoder(p, TINY, jnp.asarray(x)))
    theirs = un_t(torch_encoder(t(x), sd, TINY))
    assert ours.shape == theirs.shape == (1, 8, 8, 32)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_full_decoder_parity():
    rng = np.random.default_rng(3)
    p = init_decoder(jax.random.PRNGKey(3), TINY)
    sd = params_to_state_dict(p)
    z = rng.normal(size=(1, 8, 8, 32)).astype(np.float32)
    ours = np.asarray(apply_decoder(p, TINY, jnp.asarray(z)))
    theirs = un_t(torch_decoder(t(z), sd, TINY))
    assert ours.shape == theirs.shape == (1, 16, 16, 4)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
