"""Parity against FROZEN reference activations (tests/goldens/*.npz).

tests/test_reference_parity_direct.py pins our stack against the reference's
own torch modules, but needs /root/reference + torch at runtime. These
fixtures were produced by the same fixed-seed cases via
tools/freeze_goldens.py, so the parity evidence survives any environment:
no torch import, no reference checkout. Covered: Encoder/Decoder forward
(reference modules/diffusionmodules/model.py:342,437), VectorQuantizer2
(modules/vqvae/quantize.py:213), the serial-order forward splat
(point_rendering/warp.py:194), pixel2cam/cam2pixel/inverse_warp
(warp.py:28,43,155) and the lower-median blur (warp.py:306)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDENS), reason="goldens not generated"
)


@pytest.fixture(scope="module")
def model_stage_goldens():
    import jax

    from sgam_neurips22_tpu.core.torch_convert import (
        convert_state_dict,
        init_from_ckpt,
    )
    from sgam_neurips22_tpu.models import DDConfig, VQModelConfig, init_vqmodel

    g = np.load(os.path.join(GOLDENS, "model_stages.npz"))
    sd = {k[len("sd/"):]: g[k] for k in g.files if k.startswith("sd/")}
    dd = dict(
        double_z=False, z_channels=32, resolution=32, in_channels=4, out_ch=4,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
        dropout=0.0,
    )
    cfg = VQModelConfig(
        ddconfig=DDConfig.from_dict(dd), n_embed=64, embed_dim=32,
        use_extrapolation_mask=False,
    )
    model_np, _, _ = convert_state_dict(sd)
    params = init_from_ckpt(init_vqmodel(jax.random.PRNGKey(1), cfg), model_np)
    return g, params, cfg


def test_encoder_matches_golden(model_stage_goldens):
    from sgam_neurips22_tpu.models.vqgan.autoencoder import apply_encoder

    g, params, cfg = model_stage_goldens
    got = np.asarray(apply_encoder(params["encoder"], cfg.ddconfig, g["enc_in"]))
    np.testing.assert_allclose(
        got, g["enc_out"].transpose(0, 2, 3, 1), atol=2e-4
    )


def test_decoder_matches_golden(model_stage_goldens):
    from sgam_neurips22_tpu.models.vqgan.autoencoder import apply_decoder

    g, params, cfg = model_stage_goldens
    got = np.asarray(apply_decoder(params["decoder"], cfg.ddconfig, g["dec_in"]))
    np.testing.assert_allclose(
        got, g["dec_out"].transpose(0, 2, 3, 1), atol=2e-4
    )


def test_quantizer_matches_golden(model_stage_goldens):
    from sgam_neurips22_tpu.models.vqgan.quantize import quantize

    g, params, cfg = model_stage_goldens
    res = quantize(params["quantize"]["embedding"], jnp.asarray(g["vq_in"]), beta=0.25)
    np.testing.assert_array_equal(
        np.asarray(res.indices).reshape(-1), g["vq_indices"]
    )
    np.testing.assert_allclose(
        np.asarray(res.z_q), g["vq_zq"].transpose(0, 2, 3, 1), atol=1e-6
    )
    np.testing.assert_allclose(float(res.loss), float(g["vq_loss"]), rtol=1e-5)


def test_splat_matches_golden():
    from sgam_neurips22_tpu.geometry.splat import render_projection_from_srcs

    g = np.load(os.path.join(GOLDENS, "splat.npz"))
    b, n = g["feats"].shape[:2]
    res = render_projection_from_srcs(
        jnp.asarray(g["feats"].transpose(0, 1, 3, 4, 2)),
        jnp.asarray(g["depths"]),
        jnp.asarray(g["K"])[None],
        jnp.broadcast_to(jnp.asarray(g["K"]), (b, n, 3, 3)),
        jnp.asarray(g["src2tgt"]),
        collision="last",  # reproduces the reference's serial scatter order
    )
    np.testing.assert_allclose(
        np.asarray(res.depth)[0, ..., 0], g["depth"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.features)[0], g["features"].transpose(1, 2, 0), atol=1e-5
    )


def test_warp_functions_match_golden():
    from sgam_neurips22_tpu.geometry.camera import cam2pixel, pixel2cam
    from sgam_neurips22_tpu.geometry.warp import inverse_warp

    g = np.load(os.path.join(GOLDENS, "warp.npz"))
    b = g["depth"].shape[0]
    ks = np.tile(g["K"], (b, 1, 1))
    pc = pixel2cam(jnp.asarray(g["depth"]), jnp.asarray(np.linalg.inv(ks)))
    np.testing.assert_allclose(
        np.asarray(pc), g["pixel2cam"].transpose(0, 2, 3, 1), atol=1e-4
    )
    proj = ks @ g["pose"]
    coords, z = cam2pixel(
        pc, jnp.asarray(proj[..., :3]), jnp.asarray(proj[..., 3])
    )
    np.testing.assert_allclose(np.asarray(coords), g["cam2pixel_coords"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), g["cam2pixel_z"], atol=1e-5)

    warped, valid = inverse_warp(
        jnp.asarray(g["src_img"]), jnp.asarray(g["depth"]),
        jnp.asarray(g["src_depth"]), jnp.asarray(g["pose"]),
        jnp.asarray(ks), jnp.asarray(ks),
    )
    np.testing.assert_allclose(
        np.asarray(warped), g["inverse_warp"].transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(valid)[..., 0], g["inverse_warp_valid"][:, 0].astype(bool)
    )


def test_median_blur_matches_golden():
    from sgam_neurips22_tpu.geometry.splat import median_blur_3x3

    g = np.load(os.path.join(GOLDENS, "median.npz"))
    got = np.asarray(median_blur_3x3(jnp.asarray(g["x"])))
    np.testing.assert_array_equal(got, g["median"].transpose(0, 2, 3, 1))
