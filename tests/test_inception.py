"""InceptionV3 feature extractor tests (shapes + torch-name compatibility)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~100 s: module fixture builds full InceptionV3

from sgam_neurips22_tpu.utils.inception import (
    convert_torch_inception,
    inception_feature_fn,
    inception_v3_features,
    init_inception,
)


@pytest.fixture(scope="module")
def params():
    return init_inception(jax.random.PRNGKey(0))


def test_feature_shape(params):
    x = jnp.zeros((2, 299, 299, 3))
    feats = inception_v3_features(params, x)
    assert feats.shape == (2, 2048)


def test_param_names_torchvision_style(params):
    names = set(params)
    assert "Conv2d_1a_3x3.conv.weight" in names
    assert "Conv2d_1a_3x3.bn.running_mean" in names
    assert "Mixed_5b.branch1x1.conv.weight" in names
    assert "Mixed_6b.branch7x7_2.conv.weight" in names
    assert "Mixed_7c.branch3x3dbl_3b.conv.weight" in names
    # expected conv shapes (HWIO)
    assert params["Conv2d_1a_3x3.conv.weight"].shape == (3, 3, 3, 32)
    assert params["Mixed_5b.branch5x5_2.conv.weight"].shape == (5, 5, 48, 64)
    assert params["Mixed_6b.branch7x7_2.conv.weight"].shape == (1, 7, 128, 128)
    assert params["Mixed_7a.branch3x3_2.conv.weight"].shape == (3, 3, 192, 320)


def test_convert_roundtrip(params):
    # fabricate a torch-style state dict (OIHW) from our params and convert
    sd = {}
    for k, v in params.items():
        arr = np.asarray(v)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[k] = arr
    sd["fc.weight"] = np.zeros((1000, 2048))  # dropped
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros(())  # dropped
    back = convert_torch_inception(sd)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]), err_msg=k)


def test_feature_fn_resizes(params):
    fn = inception_feature_fn(params)
    out = fn(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 2048)
