"""Pin the InceptionV3 (FID backbone) weight-conversion path numerically —
the FID half of VERDICT round-1 weak item 6 (LPIPS half:
tests/test_lpips_convert.py).

Fabricates a random torchvision-layout InceptionV3 state_dict, runs a
plain-torch oracle mirroring pytorch-fid's network exactly (BasicConv2d =
conv(no bias) + BN eps 1e-3 + ReLU; FID blocks use
avg_pool2d(count_include_pad=False); Mixed_7c pools with MAX per
FIDInceptionE_2 — reference modules/misc/pytorch_fid/inception.py), converts
via utils.inception.convert_torch_inception, and requires the JAX features
to match. Real pt_inception weights then give reference-parity FID by
construction.
"""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sgam_neurips22_tpu.utils.inception import (
    convert_torch_inception,
    inception_v3_features,
)


class Oracle:
    def __init__(self, seed=0, fid=True):
        # fid=True mirrors pytorch-fid's overrides (count_include_pad=False
        # avg-pools in A/C/7b, max pool at 7c); fid=False is plain
        # torchvision inception_v3 pooling
        self.g = torch.Generator().manual_seed(seed)
        self.fid = fid
        self.sd = {}

    def basic(self, name, x, cout, kernel, stride=1, padding=(0, 0)):
        kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
        cin = x.shape[1]
        wk = f"{name}.conv.weight"
        if wk not in self.sd:
            self.sd[wk] = 0.1 * torch.randn(cout, cin, kh, kw, generator=self.g)
            self.sd[f"{name}.bn.weight"] = 1 + 0.1 * torch.randn(cout, generator=self.g)
            self.sd[f"{name}.bn.bias"] = 0.1 * torch.randn(cout, generator=self.g)
            self.sd[f"{name}.bn.running_mean"] = 0.1 * torch.randn(cout, generator=self.g)
            self.sd[f"{name}.bn.running_var"] = torch.rand(cout, generator=self.g) + 0.5
        y = F.conv2d(x, self.sd[wk], stride=stride, padding=padding)
        y = F.batch_norm(
            y, self.sd[f"{name}.bn.running_mean"], self.sd[f"{name}.bn.running_var"],
            self.sd[f"{name}.bn.weight"], self.sd[f"{name}.bn.bias"],
            training=False, eps=1e-3,
        )
        return F.relu(y)

    def incept_a(self, name, x, pool_features):
        b1 = self.basic(f"{name}.branch1x1", x, 64, 1)
        b5 = self.basic(f"{name}.branch5x5_1", x, 48, 1)
        b5 = self.basic(f"{name}.branch5x5_2", b5, 64, 5, padding=(2, 2))
        b3 = self.basic(f"{name}.branch3x3dbl_1", x, 64, 1)
        b3 = self.basic(f"{name}.branch3x3dbl_2", b3, 96, 3, padding=(1, 1))
        b3 = self.basic(f"{name}.branch3x3dbl_3", b3, 96, 3, padding=(1, 1))
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = self.basic(f"{name}.branch_pool", bp, pool_features, 1)
        return torch.cat([b1, b5, b3, bp], 1)

    def incept_b(self, name, x):
        b3 = self.basic(f"{name}.branch3x3", x, 384, 3, stride=2)
        bd = self.basic(f"{name}.branch3x3dbl_1", x, 64, 1)
        bd = self.basic(f"{name}.branch3x3dbl_2", bd, 96, 3, padding=(1, 1))
        bd = self.basic(f"{name}.branch3x3dbl_3", bd, 96, 3, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def incept_c(self, name, x, c7):
        b1 = self.basic(f"{name}.branch1x1", x, 192, 1)
        b7 = self.basic(f"{name}.branch7x7_1", x, c7, 1)
        b7 = self.basic(f"{name}.branch7x7_2", b7, c7, (1, 7), padding=(0, 3))
        b7 = self.basic(f"{name}.branch7x7_3", b7, 192, (7, 1), padding=(3, 0))
        bd = self.basic(f"{name}.branch7x7dbl_1", x, c7, 1)
        bd = self.basic(f"{name}.branch7x7dbl_2", bd, c7, (7, 1), padding=(3, 0))
        bd = self.basic(f"{name}.branch7x7dbl_3", bd, c7, (1, 7), padding=(0, 3))
        bd = self.basic(f"{name}.branch7x7dbl_4", bd, c7, (7, 1), padding=(3, 0))
        bd = self.basic(f"{name}.branch7x7dbl_5", bd, 192, (1, 7), padding=(0, 3))
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = self.basic(f"{name}.branch_pool", bp, 192, 1)
        return torch.cat([b1, b7, bd, bp], 1)

    def incept_d(self, name, x):
        b3 = self.basic(f"{name}.branch3x3_1", x, 192, 1)
        b3 = self.basic(f"{name}.branch3x3_2", b3, 320, 3, stride=2)
        b7 = self.basic(f"{name}.branch7x7x3_1", x, 192, 1)
        b7 = self.basic(f"{name}.branch7x7x3_2", b7, 192, (1, 7), padding=(0, 3))
        b7 = self.basic(f"{name}.branch7x7x3_3", b7, 192, (7, 1), padding=(3, 0))
        b7 = self.basic(f"{name}.branch7x7x3_4", b7, 192, 3, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def incept_e(self, name, x, pool_mode="avg"):
        b1 = self.basic(f"{name}.branch1x1", x, 320, 1)
        b3 = self.basic(f"{name}.branch3x3_1", x, 384, 1)
        b3 = torch.cat(
            [
                self.basic(f"{name}.branch3x3_2a", b3, 384, (1, 3), padding=(0, 1)),
                self.basic(f"{name}.branch3x3_2b", b3, 384, (3, 1), padding=(1, 0)),
            ], 1,
        )
        bd = self.basic(f"{name}.branch3x3dbl_1", x, 448, 1)
        bd = self.basic(f"{name}.branch3x3dbl_2", bd, 384, 3, padding=(1, 1))
        bd = torch.cat(
            [
                self.basic(f"{name}.branch3x3dbl_3a", bd, 384, (1, 3), padding=(0, 1)),
                self.basic(f"{name}.branch3x3dbl_3b", bd, 384, (3, 1), padding=(1, 0)),
            ], 1,
        )
        if pool_mode == "max":
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = self.basic(f"{name}.branch_pool", bp, 192, 1)
        return torch.cat([b1, b3, bd, bp], 1)

    def forward(self, x):
        h = self.basic("Conv2d_1a_3x3", x, 32, 3, stride=2)
        h = self.basic("Conv2d_2a_3x3", h, 32, 3)
        h = self.basic("Conv2d_2b_3x3", h, 64, 3, padding=(1, 1))
        h = F.max_pool2d(h, 3, 2)
        h = self.basic("Conv2d_3b_1x1", h, 80, 1)
        h = self.basic("Conv2d_4a_3x3", h, 192, 3)
        h = F.max_pool2d(h, 3, 2)
        h = self.incept_a("Mixed_5b", h, 32)
        h = self.incept_a("Mixed_5c", h, 64)
        h = self.incept_a("Mixed_5d", h, 64)
        h = self.incept_b("Mixed_6a", h)
        h = self.incept_c("Mixed_6b", h, 128)
        h = self.incept_c("Mixed_6c", h, 160)
        h = self.incept_c("Mixed_6d", h, 160)
        h = self.incept_c("Mixed_6e", h, 192)
        h = self.incept_d("Mixed_7a", h)
        h = self.incept_e("Mixed_7b", h)
        # FIDInceptionE_2 max-pools at 7c; torchvision avg-pools
        h = self.incept_e("Mixed_7c", h, pool_mode="max" if self.fid else "avg")
        return h.mean(dim=(2, 3))


def test_converted_inception_matches_torch_oracle():
    oracle = Oracle(seed=0)
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (1, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        want = oracle.forward(torch.from_numpy(x)).numpy()
    params = convert_torch_inception(oracle.sd)
    got = np.asarray(
        inception_v3_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    assert got.shape == (1, 2048)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)


def test_converted_inception_matches_torchvision_pooling_oracle():
    """fid_variant=False must reproduce plain torchvision inception_v3
    pooling (count_include_pad=True everywhere, avg at Mixed_7c)."""
    oracle = Oracle(seed=1, fid=False)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (1, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        want = oracle.forward(torch.from_numpy(x)).numpy()
    params = convert_torch_inception(oracle.sd)
    got = np.asarray(
        inception_v3_features(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), fid_variant=False
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)
