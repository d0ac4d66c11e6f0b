"""Direct parity vs the REFERENCE'S OWN torch modules (strongest in-env
evidence short of the unpublished checkpoints).

Imports Encoder/Decoder/VectorQuantizer2 from the reference checkout at
/root/reference (plain torch — importable without pytorch_lightning), runs
them with random weights, exports the state_dict through our converter, and
requires our JAX model to reproduce the activations. Unlike
tests/test_block_parity.py (which compares against our torch-functional
re-expression), this pins parity to the reference implementation itself.

Skipped automatically when the reference checkout is absent.
"""
import os
import sys

import jax
import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "sgam")),
    reason="reference checkout not available",
)

DD = dict(
    double_z=False, z_channels=32, resolution=32, in_channels=4, out_ch=4,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16], dropout=0.0,
)


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, REFERENCE)
    import torch

    from sgam.generative_sensing_module.modules.diffusionmodules.model import (
        Decoder,
        Encoder,
    )
    from sgam.generative_sensing_module.modules.vqvae.quantize import (
        VectorQuantizer2,
    )

    torch.manual_seed(0)
    enc = Encoder(**DD).eval()
    dec = Decoder(**DD).eval()
    vq = VectorQuantizer2(64, 32, beta=0.25).eval()
    return enc, dec, vq


def _to_jax_params(enc, dec, vq):
    """Reference state_dicts -> our param tree via the production converter."""
    from sgam_neurips22_tpu.core.torch_convert import convert_state_dict, init_from_ckpt
    from sgam_neurips22_tpu.models import DDConfig, VQModelConfig, init_vqmodel

    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("quantize", vq)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()
    cfg = VQModelConfig(
        ddconfig=DDConfig.from_dict(DD), n_embed=64, embed_dim=32,
        use_extrapolation_mask=False,
    )
    model_np, _, _ = convert_state_dict(sd)
    params = init_vqmodel(jax.random.PRNGKey(1), cfg)
    params = init_from_ckpt(params, model_np)
    return params, cfg


def test_encoder_matches_reference_exactly(reference_modules):
    import torch

    enc, dec, vq = reference_modules
    params, cfg = _to_jax_params(enc, dec, vq)
    from sgam_neurips22_tpu.models.vqgan.autoencoder import apply_encoder

    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(apply_encoder(params["encoder"], cfg.ddconfig, x))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-4)


def test_decoder_matches_reference_exactly(reference_modules):
    import torch

    enc, dec, vq = reference_modules
    params, cfg = _to_jax_params(enc, dec, vq)
    from sgam_neurips22_tpu.models.vqgan.autoencoder import apply_decoder

    z = np.random.default_rng(1).normal(size=(2, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        want = dec(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(apply_decoder(params["decoder"], cfg.ddconfig, z))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-4)


def test_quantizer_matches_reference_exactly(reference_modules):
    import torch

    enc, dec, vq = reference_modules
    params, cfg = _to_jax_params(enc, dec, vq)
    from sgam_neurips22_tpu.models.vqgan.quantize import quantize

    z = np.random.default_rng(2).normal(size=(1, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        zq_t, loss_t, (_, _, idx_t) = vq(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    res = quantize(params["quantize"]["embedding"], z, beta=0.25)
    np.testing.assert_array_equal(
        np.asarray(res.indices).reshape(-1), idx_t.numpy().reshape(-1)
    )
    np.testing.assert_allclose(
        np.asarray(res.z_q), zq_t.numpy().transpose(0, 2, 3, 1), atol=1e-6
    )
    np.testing.assert_allclose(float(res.loss), float(loss_t), rtol=1e-5)


def test_splat_matches_reference_render_projection(reference_modules):
    """Our forward splat vs the reference's render_projection_from_srcs_fast
    (collision='last' reproduces its serial scatter order)."""
    import torch

    sys.path.insert(0, REFERENCE)
    from sgam.point_rendering.warp import render_projection_from_srcs_fast

    from sgam_neurips22_tpu.geometry.splat import render_projection_from_srcs
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    b, n, h, w = 1, 2, 32, 32
    k = np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]], np.float32)
    feats = rng.uniform(-1, 1, (b, n, 3, h, w)).astype(np.float32)
    depths = rng.uniform(3, 6, (b, n, h, w)).astype(np.float32)
    src2tgt = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    src2tgt[:, 1, 0, 3] = 0.15  # second source shifted
    with torch.no_grad():
        merged_d, merged_f, *_ = render_projection_from_srcs_fast(
            torch.from_numpy(feats),
            torch.from_numpy(depths),
            torch.from_numpy(np.tile(k, (b, 1, 1))),
            torch.from_numpy(np.tile(k, (b * n, 1, 1))),
            torch.from_numpy(src2tgt.reshape(b * n, 4, 4)),
            src_num=n,
            parallel=False,  # the serial scatter = well-defined order
        )
    res = render_projection_from_srcs(
        jnp.asarray(feats.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(depths),
        jnp.asarray(k)[None],
        jnp.broadcast_to(jnp.asarray(k), (b, n, 3, 3)),
        jnp.asarray(src2tgt),
        collision="last",
    )
    got_d = np.asarray(res.depth)[0, ..., 0]
    want_d = merged_d.numpy().reshape(h, w)
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)
    got_f = np.asarray(res.features)[0]
    want_f = merged_f.numpy().reshape(3, h, w).transpose(1, 2, 0)
    np.testing.assert_allclose(got_f, want_f, atol=1e-5)


def test_geometry_matches_reference_warp_functions():
    """pixel2cam / cam2pixel / inverse_warp vs the reference's own torch
    implementations (sgam/point_rendering/warp.py:28-191)."""
    import torch

    sys.path.insert(0, REFERENCE)
    from sgam.point_rendering import warp as ref_warp

    import jax.numpy as jnp

    from sgam_neurips22_tpu.geometry.camera import cam2pixel, pixel2cam
    from sgam_neurips22_tpu.geometry.warp import inverse_warp

    rng = np.random.default_rng(4)
    b, h, w = 2, 24, 24
    k = np.array([[15.0, 0, 11.5], [0, 15.0, 11.5], [0, 0, 1]], np.float32)
    ks = np.tile(k, (b, 1, 1))
    depth = rng.uniform(3, 6, (b, h, w)).astype(np.float32)

    with torch.no_grad():
        pc_t = ref_warp.pixel2cam(
            torch.from_numpy(depth), torch.from_numpy(np.linalg.inv(ks).astype(np.float32))
        ).numpy()
    pc = np.asarray(pixel2cam(jnp.asarray(depth), jnp.asarray(np.linalg.inv(ks))))
    np.testing.assert_allclose(pc, pc_t.transpose(0, 2, 3, 1), atol=1e-4)

    # shift in BOTH axes: with y-translation 0, the top image row projects
    # to normalized y == -1.0 exactly, and the reference's `<= 1` validity
    # test flips on 1-ulp accumulation-order differences (it is equally
    # knife-edged between the reference's own CPU and CUDA paths)
    pose = np.tile(np.eye(4, dtype=np.float32)[:3], (b, 1, 1))
    pose[:, 0, 3] = 0.2
    pose[:, 1, 3] = 0.07
    proj = ks @ pose
    with torch.no_grad():
        coords_t, z_t = ref_warp.cam2pixel(
            torch.from_numpy(pc_t),
            torch.from_numpy(proj[..., :3].copy()),
            torch.from_numpy(proj[..., 3:].copy()),
        )
    coords, z = cam2pixel(jnp.asarray(pc), jnp.asarray(proj[..., :3]), jnp.asarray(proj[..., 3]))
    np.testing.assert_allclose(np.asarray(coords), coords_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=1e-5)

    src_img = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    src_depth = rng.uniform(3, 6, (b, h, w)).astype(np.float32)
    with torch.no_grad():
        warped_t, valid_t = ref_warp.inverse_warp(
            torch.from_numpy(src_img.transpose(0, 3, 1, 2)),
            torch.from_numpy(depth),
            torch.from_numpy(src_depth),
            torch.from_numpy(pose),
            torch.from_numpy(ks),
            torch.from_numpy(ks),
        )
    warped, valid = inverse_warp(
        jnp.asarray(src_img), jnp.asarray(depth), jnp.asarray(src_depth),
        jnp.asarray(pose), jnp.asarray(ks), jnp.asarray(ks),
    )
    np.testing.assert_allclose(
        np.asarray(warped), warped_t.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(valid)[..., 0], valid_t.numpy()[:, 0].astype(bool)
    )


def test_median_blur_matches_reference():
    import torch

    sys.path.insert(0, REFERENCE)
    from sgam.point_rendering.warp import median_blur as ref_median

    import jax.numpy as jnp

    from sgam_neurips22_tpu.geometry.splat import median_blur_3x3

    rng = np.random.default_rng(5)
    # tie-heavy integer data exercises the lower-median tie-breaking
    x = rng.integers(0, 3, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_median(torch.from_numpy(x.transpose(0, 3, 1, 2)), (3, 3)).numpy()
    got = np.asarray(median_blur_3x3(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want.transpose(0, 2, 3, 1))


def test_clevr_pair_dataset_matches_reference(tmp_path):
    """Our CLEVR pair dataset vs the reference's Blender3dBase on a
    synthetic scene: same graph edges, same deterministic val-split source
    picks, same relative transforms / ray->z depths / normalizations
    (reference data/clevr-infinite.py:28-172)."""
    import importlib
    import json

    from PIL import Image

    sys.path.insert(0, REFERENCE)
    ref_mod = importlib.import_module("data.clevr-infinite")

    from sgam_neurips22_tpu.training.data.pair_dataset import ClevrInfinitePairs

    rng = np.random.default_rng(6)
    h = w = 64
    root = tmp_path / "ds"
    scene = root / "validation" / "scene_000"
    os.makedirs(scene)
    os.makedirs(root / "cache")
    k = np.array([[40.0, 0, (w - 1) / 2], [0, 40.0, (h - 1) / 2], [0, 0, 1.0]])
    np.save(root / "K.npy", k)
    frames = []
    for i in range(6):
        c2w = np.eye(4)
        c2w[:3, 3] = [i * 1.4, 0.3 * (i % 2), 4.0]  # some pairs beyond radius 3
        frames.append({"transform_matrix": c2w.tolist()})
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(scene / f"im_{i:05d}.png")
        np.save(scene / f"dm_{i:05d}.npy", rng.uniform(3, 7, (h, w)).astype(np.float32))
    (scene / "transforms.json").write_text(json.dumps({"frames": frames}))

    ref_ds = ref_mod.Blender3dBase(
        split="validation", dataset_dir=str(root), n_src=2,
        dataset="clevr-infinite", image_resolution=(h, w),
    )
    ours = ClevrInfinitePairs(
        split="validation", dataset_dir=str(root), n_src=2,
        image_resolution=(h, w), use_cache=False,
    )
    assert len(ref_ds) == len(ours) == 6
    for idx in range(6):
        want = ref_ds[idx]
        got = ours[idx]
        np.testing.assert_allclose(got["Ks"], want["Ks"], atol=1e-5, err_msg=f"idx {idx}")
        np.testing.assert_allclose(got["R_rels"], want["R_rels"], atol=1e-6)
        np.testing.assert_allclose(got["t_rels"], want["t_rels"], atol=1e-6)
        np.testing.assert_allclose(got["dst_img"], want["dst_img"], atol=1e-6)
        np.testing.assert_allclose(got["src_imgs"], want["src_imgs"], atol=1e-6)
        np.testing.assert_allclose(got["dst_depth"], want["dst_depth"][..., 0], atol=1e-4)
        np.testing.assert_allclose(
            got["src_depths"], want["src_depths"][..., 0], atol=1e-4
        )
        np.testing.assert_array_equal(got["src_masks"], want["src_masks"])


def test_google_earth_pair_dataset_matches_reference(tmp_path):
    """Our GoogleEarth pair dataset vs the reference's GoogleEarthBase:
    is_valid gating, frame_id%4 rotation-variant edges within 0.3, isolated
    node dropping, the 65504 sentinel handling (sources replaced, target
    kept + tgt_pixel_mask), and the extra batch keys
    (reference data/google_earth.py:30-215)."""
    import importlib
    import json

    from PIL import Image

    sys.path.insert(0, REFERENCE)
    ref_mod = importlib.import_module("data.google_earth")

    from sgam_neurips22_tpu.training.data.pair_dataset import GoogleEarthPairs

    rng = np.random.default_rng(7)
    h = w = 64
    root = tmp_path / "ge"
    scene = root / "validation" / "scene_000"
    os.makedirs(scene)
    os.makedirs(root / "cache")
    k512 = np.array([[497.77774, 0, 256.0], [0, 497.77774, 256.0], [0, 0, 1.0]])
    np.save(root / "K.npy", k512)
    frames = []
    # 2 grid points x 4 rotation variants 0.1 apart (edges within same %4),
    # + 1 invalid frame + 1 isolated valid frame (dropped)
    positions = [(0.0, 0.0)] * 4 + [(0.1, 0.0)] * 4 + [(0.05, 0.05), (9.0, 9.0)]
    valid = [True] * 8 + [False, True]
    for i, ((px, py), v) in enumerate(zip(positions, valid)):
        c2w = np.eye(4)
        c2w[:3, 3] = [px, py, 2.0]
        frames.append(
            {
                "transform_matrix": c2w.tolist(),
                "is_valid": v,
                "file_path": f"./validation/scene_000/im_{i:05d}.png",
            }
        )
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(scene / f"im_{i:05d}.png")
        dm = rng.uniform(1, 4, (h, w)).astype(np.float32)
        dm[:4, :4] = 65504.0  # sentinel patch
        np.save(scene / f"dm_{i:05d}.npy", dm)
    (scene / "transforms.json").write_text(json.dumps({"frames": frames}))

    ref_ds = ref_mod.GoogleEarthBase(
        split="validation", dataset_dir=str(root), n_src=2,
        dataset="google_earth", image_resolution=(h, w),
    )
    ours = GoogleEarthPairs(
        split="validation", dataset_dir=str(root), n_src=2,
        image_resolution=(h, w), use_cache=False,
    )
    # 8 connected valid frames (invalid + isolated dropped)
    assert len(ref_ds) == len(ours) == 8
    for idx in range(8):
        want = ref_ds[idx]
        got = ours[idx]
        # documented deviation: the reference's src_masks is ALWAYS all-ones
        # (`mask[:src_num] = 1` with src_num = self.src_num in both branches,
        # google_earth.py:186-188) and is never consumed by its splat — ours
        # marks the REAL sources so padded zero-frames are excluded
        assert (want["src_masks"] == 1).all()
        n_real = int((got["src_frame_ids"] >= 0).sum())
        np.testing.assert_array_equal(
            got["src_masks"], (np.arange(2) < n_real).astype(np.float32)
        )
        for key in ("Ks", "R_rels", "t_rels",
                    "tgt_frame_id", "src_frame_ids", "tgt_pixel_mask"):
            np.testing.assert_allclose(
                got[key],
                want[key][0] if key == "tgt_pixel_mask" and want[key].ndim != got[key].ndim else want[key],
                atol=1e-5, err_msg=f"{key} idx {idx}",
            )
        np.testing.assert_allclose(got["dst_img"], want["dst_img"], atol=1e-6)
        np.testing.assert_allclose(got["src_imgs"], want["src_imgs"], atol=1e-6)
        np.testing.assert_allclose(got["dst_depth"], want["dst_depth"][..., 0], atol=1e-4)
        np.testing.assert_allclose(got["src_depths"], want["src_depths"][..., 0], atol=1e-4)


def test_shipped_lpips_lin_heads_convert():
    """The reference SHIPS its LPIPS linear heads
    (modules/autoencoder/lpips/vgg.pth, loaded at lpips.py:27-30); our
    converter must ingest the real artifact (the VGG16 backbone still needs
    torchvision's download, but the heads are the reference-trained part)."""
    import torch

    path = os.path.join(
        REFERENCE, "sgam/generative_sensing_module/modules/autoencoder/lpips/vgg.pth"
    )
    if not os.path.exists(path):
        pytest.skip("vgg.pth not shipped in this checkout")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v for k, v in sd.items() if "lin" in k}

    from sgam_neurips22_tpu.training.lpips import (
        LPIPS_CHANNELS,
        VGG16_CONVS,
        convert_torch_lpips,
        init_lpips,
    )

    # convert the real heads onto a random backbone (torchvision's VGG16
    # weights are the only missing piece in this environment)
    params = init_lpips(jax.random.PRNGKey(0))
    vgg_np = {}
    for (idx, _, _), w in zip(VGG16_CONVS, params["convs"]):
        vgg_np[f"{idx}.weight"] = np.asarray(w["weight"]).transpose(3, 2, 0, 1)
        vgg_np[f"{idx}.bias"] = np.zeros(np.asarray(w["weight"]).shape[-1], np.float32)
    converted = convert_torch_lpips(
        vgg_np, {k: v.numpy() for k, v in sd.items()}
    )
    # the real reference-trained head weights came through
    for i, c in enumerate(LPIPS_CHANNELS):
        w = np.asarray(converted["lins"][i]["weight"])
        assert w.shape == (1, 1, c, 1)
        ref = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        np.testing.assert_allclose(w.reshape(-1), ref, atol=1e-7)
        assert (ref >= 0).all()  # LPIPS heads are non-negative by training


def test_inverse_warp_multi_src_matches_torch_composition():
    """Map-requery conditioning warp vs a torch composition of the
    reference's inverse_warping (inference_pipeline.py:662-743): per-source
    F.grid_sample(src+2, nearest, zeros, align_corners=False) on projected
    coords, then the sequential z-buffer scan keyed on
    |warped_src_depth - src_depth| with the (sum > 0) occupancy gate.
    (The reference method itself is cuda-pinned and sits in a module whose
    import needs pytorch_lightning; its geometry helpers pixel2cam/cam2pixel
    are parity-tested above, so composing them with torch ops here pins the
    full path to torch semantics.)"""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp

    from sgam_neurips22_tpu.geometry import (
        cam2pixel,
        euler2mat,
        make_intrinsics,
        pixel2cam,
        pose_matrix,
    )
    from sgam_neurips22_tpu.geometry.camera import inv3x3
    from sgam_neurips22_tpu.geometry.warp import inverse_warp_multi_src

    rng = np.random.default_rng(23)
    b, n, h, w = 1, 3, 20, 20
    k = np.asarray(make_intrinsics(16.0, 16.0, (w - 1) / 2, (h - 1) / 2))
    src_imgs = rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)
    src_depths = rng.uniform(2.0, 6.0, (b, n, h, w)).astype(np.float32)
    tgt_depth = rng.uniform(2.0, 6.0, (b, h, w)).astype(np.float32)
    tgt_depth[0, :3, :3] = 0.0  # map holes
    poses = []
    for _ in range(n):
        ang = rng.uniform(-0.25, 0.25, size=(1, 3)).astype(np.float32)
        r = np.asarray(euler2mat(jnp.asarray(ang)))[0]
        t = rng.uniform(-0.4, 0.4, size=3).astype(np.float32)
        poses.append(np.asarray(pose_matrix(jnp.asarray(r)[None], jnp.asarray(t)[None]))[0])
    tgt2srcs = np.stack(poses)[None].astype(np.float32)
    ks = np.broadcast_to(k, (b, n, 3, 3)).astype(np.float32)

    got = np.asarray(
        inverse_warp_multi_src(
            jnp.asarray(src_imgs), jnp.asarray(src_depths),
            jnp.asarray(tgt_depth), jnp.asarray(ks), jnp.asarray(k)[None],
            jnp.asarray(tgt2srcs),
        )
    )

    # torch composition (projection via the parity-tested geometry fns)
    cam_pts = pixel2cam(jnp.asarray(tgt_depth), inv3x3(jnp.asarray(k)[None]))
    cam_pts_r = jnp.repeat(cam_pts, n, axis=0)
    proj = np.einsum("bnij,bnjk->bnik", ks, tgt2srcs[..., :3, :])
    coords, wsd = cam2pixel(
        cam_pts_r,
        jnp.asarray(proj[..., :3].reshape(n, 3, 3)),
        jnp.asarray(proj[..., 3].reshape(n, 3)),
        clamp_z=None,
    )
    sampled = F.grid_sample(
        torch.from_numpy(src_imgs[0]).permute(0, 3, 1, 2) + 2.0,
        torch.from_numpy(np.array(coords)),
        mode="nearest", padding_mode="zeros", align_corners=False,
    )  # [N, 3, H, W]
    wsd_t = torch.from_numpy(np.asarray(wsd))  # [N, H, W]
    src_d = torch.from_numpy(src_depths[0])
    zbuf = torch.full((h, w), 99999.0)
    out = torch.zeros(3, h, w)
    for i in range(n):
        diff = (wsd_t[i] - src_d[i]).abs()
        mask = (diff < zbuf) & (wsd_t[i] >= 0) & (sampled[i].sum(0) > 0)
        zbuf = torch.where(mask, diff, zbuf)
        out = torch.where(mask[None], sampled[i] - 2.0, out)
    want = out.permute(1, 2, 0).numpy()[None]

    np.testing.assert_array_equal(got, want)
