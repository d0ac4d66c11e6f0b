"""Pin the LPIPS weight-conversion path numerically (VERDICT round-1 weak
item 6: 'no test pins the converted-weight path beyond shape checks').

Pretrained VGG16 weights are unobtainable in this environment, but the
conversion path does not care about the VALUES: fabricate a random
torchvision-layout `features.*` state_dict + random LPIPS lin heads, run a
plain-torch oracle that mirrors the reference LPIPS exactly
(modules/losses/lpips.py: ScalingLayer :57-63, vgg16 slices :78-123,
unit-normalize + 1x1 lin heads + spatial average :41-54), convert with
tools/convert_lpips's convert_torch_lpips, and require the JAX lpips() to
match. A user who runs the converter on the real .pth files then gets
reference-parity perceptual loss by construction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sgam_neurips22_tpu.training.lpips import (
    VGG16_CONVS,
    convert_torch_lpips,
    lpips,
)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def fabricate_state_dicts(seed=0):
    g = torch.Generator().manual_seed(seed)
    vgg = {}
    for idx, cin, cout in VGG16_CONVS:
        vgg[f"{idx}.weight"] = 0.2 * torch.randn(cout, cin, 3, 3, generator=g)
        vgg[f"{idx}.bias"] = 0.1 * torch.randn(cout, generator=g)
    lin = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lin[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g)
    return vgg, lin


def torch_vgg_slices(vgg, x):
    """relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 slice outputs (reference
    lpips.py:82-100 slices torchvision features at [0,4), [4,9), [9,16),
    [16,23), [23,30))."""
    outs = []
    conv_iter = iter(VGG16_CONVS)
    h = x
    for block, n in enumerate([2, 2, 3, 3, 3]):
        if block > 0:
            h = F.max_pool2d(h, 2, 2)
        for _ in range(n):
            idx, _, _ = next(conv_iter)
            h = F.relu(F.conv2d(h, vgg[f"{idx}.weight"], vgg[f"{idx}.bias"], padding=1))
        outs.append(h)
    return outs


def torch_lpips(vgg, lin, x, y):
    xs, ys = (x - SHIFT) / SCALE, (y - SHIFT) / SCALE
    fx, fy = torch_vgg_slices(vgg, xs), torch_vgg_slices(vgg, ys)

    def unit(t):
        return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for k in range(5):
        d = (unit(fx[k]) - unit(fy[k])) ** 2
        val = F.conv2d(d, lin[f"lin{k}.model.1.weight"])
        total = total + val.mean(dim=(2, 3), keepdim=True)
    return total


def test_converted_lpips_matches_torch_oracle():
    vgg, lin = fabricate_state_dicts()
    params = convert_torch_lpips(
        {k: v.numpy() for k, v in vgg.items()},
        {k: v.numpy() for k, v in lin.items()},
    )
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_lpips(vgg, lin, torch.from_numpy(x), torch.from_numpy(y))
    got = lpips(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1), want.numpy().reshape(-1), rtol=2e-4, atol=2e-5
    )
    # distances are symmetric-ish sanity: lpips(x, x) == 0
    zero = lpips(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-6)
