"""Tests for auxiliary modules (extras, actnorm, lr schedule, fid math)."""
import jax
import jax.numpy as jnp
import numpy as np

from sgam_neurips22_tpu.models.extras import (
    bce_loss,
    chamfer_distance,
    coord_stage,
    dummy_cond_stage,
    kld_loss,
    labelator,
    positional_embedder,
    sos_provider,
)
from sgam_neurips22_tpu.training.actnorm import apply_actnorm, init_actnorm
from sgam_neurips22_tpu.training.lr_schedule import lambda_warmup_cosine
from sgam_neurips22_tpu.utils.fid import (
    calculate_frechet_distance,
    compute_statistics,
)


def test_positional_embedder():
    embed, mult = positional_embedder(4)
    x = jnp.ones((2, 3))
    out = embed(x)
    assert out.shape == (2, 3 * mult)
    assert mult == 1 + 8


def test_kld_standard_normal_is_zero():
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kld_loss(mu, logvar)) == 0.0


def test_bce_matches_definition():
    logits = jnp.asarray([0.5, -1.0])
    targets = jnp.asarray([1.0, 0.0])
    expect = -np.mean(
        targets * np.log(1 / (1 + np.exp(-np.asarray(logits))))
        + (1 - targets) * np.log(1 - 1 / (1 + np.exp(-np.asarray(logits))))
    )
    np.testing.assert_allclose(float(bce_loss(logits, targets)), expect, rtol=1e-5)


def test_chamfer_zero_for_identical():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(30, 3)))
    assert float(chamfer_distance(pts, pts)) < 1e-10


def test_cond_stage_stubs():
    r = labelator(jnp.asarray([1, 2]), 4)
    assert r.indices.shape == (2, 1)
    r = sos_provider(3, sos_token=7)
    assert (np.asarray(r.indices) == 7).all()
    r = coord_stage(jnp.asarray([[0.0, 0.5, 0.999]]), 10)
    np.testing.assert_array_equal(np.asarray(r.indices), [[0, 5, 9]])
    x = jnp.ones((2, 4))
    assert np.allclose(np.asarray(dummy_cond_stage(x).quant), 1.0)


def test_actnorm_data_init_standardizes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(3.0, 2.0, (8, 4, 4, 6)).astype(np.float32))
    p = init_actnorm(6)
    y, p2 = apply_actnorm(p, x, train=True)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(0, 1, 2))), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y.std(axis=(0, 1, 2))), 1.0, atol=1e-3)
    # second batch does NOT re-init
    x2 = x + 5.0
    y2, p3 = apply_actnorm(p2, x2, train=True)
    np.testing.assert_allclose(np.asarray(p3["loc"]), np.asarray(p2["loc"]))
    assert abs(float(y2.mean())) > 1.0


def test_lr_schedule_shape():
    f = lambda_warmup_cosine(10, 0.1, 1.0, 0.0, 100)
    assert float(f(0)) == 0.0
    np.testing.assert_allclose(float(f(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(f(100)), 0.1, rtol=1e-5)
    assert float(f(55)) < 1.0 and float(f(55)) > 0.1


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(500, 16))
    mu, sigma = compute_statistics(f)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    rng = np.random.default_rng(3)
    f1 = rng.normal(size=(2000, 8))
    f2 = f1 + 2.0
    mu1, s1 = compute_statistics(f1)
    mu2, s2 = compute_statistics(f2)
    d = calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(d, 4.0 * 8, rtol=0.05)  # ||shift||^2 = 4*8


def test_find_extrapolation_regions():
    from sgam_neurips22_tpu.pipeline.analysis import find_extrapolation_regions

    mask = np.zeros((100, 100), bool)
    mask[10:90, 10:90] = True  # 6400 px > 4000
    mask[0:3, 0:3] = True  # tiny, filtered
    regions = find_extrapolation_regions(mask, min_area=4000)
    assert len(regions) == 1
    assert regions[0]["area"] == 80 * 80
    assert regions[0]["bbox"] == (10, 10, 89, 89)


def test_get_closest_anchor():
    from sgam_neurips22_tpu.pipeline.selection import get_closest_anchor
    from sgam_neurips22_tpu.pipeline.trajectory import prepare_grid

    grid = prepare_grid("clevr-infinite", (3, 3))
    anchor = get_closest_anchor(grid, [0, 8], tgt_idx=1)
    assert anchor == 0  # (0,1) is nearer to (0,0) than to (2,2)


def test_kitti360_codec_roundtrip():
    import jax.numpy as jnp
    from sgam_neurips22_tpu.geometry.codec import get_codec

    codec = get_codec("kitti360")
    d = jnp.linspace(3.0, 75.0, 32)
    np.testing.assert_allclose(
        np.asarray(codec.decode(codec.encode(d))), np.asarray(d), rtol=1e-4
    )


def test_concat_dataset_with_index():
    from sgam_neurips22_tpu.training.data.codebook_dataset import (
        ConcatDatasetWithIndex,
    )

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            return {"v": self.tag * 10 + i}

    ds = ConcatDatasetWithIndex([Fake(2, 1), Fake(3, 2)])
    assert len(ds) == 5
    assert ds[1] == {"v": 11, "dataset_index": 0}
    assert ds[2] == {"v": 20, "dataset_index": 1}
    assert ds[4] == {"v": 22, "dataset_index": 1}


def test_reparameterize_stats():
    import jax
    from sgam_neurips22_tpu.models.extras import reparameterize

    mu = jnp.full((10000,), 2.0)
    logvar = jnp.zeros((10000,))
    z = reparameterize(jax.random.PRNGKey(0), mu, logvar)
    assert abs(float(z.mean()) - 2.0) < 0.05
    assert abs(float(z.std()) - 1.0) < 0.05
