"""Per-dataset depth <-> scaled-inverse-disparity codecs.

The model consumes and produces depth as a scaled inverse-depth "disparity"
channel in [-1, 1]; each dataset has its own affine map (reference:
model.py:210-229 for encoding; inference_pipeline.py:906-911 for decoding
back to metric depth). Masked (extrapolated) pixels encode to -2.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DepthCodec:
    """disparity = 2 * ((1/(d + shift) - inv_hi) / (inv_lo - inv_hi)) - 1

    where inv_lo = 1/(lo + shift), inv_hi = 1/(hi + shift) for a metric depth
    range [lo, hi]."""

    name: str
    shift: float
    inv_lo: float  # 1/(near+shift): disparity=+1 end
    inv_hi: float  # 1/(far+shift): disparity=-1 end
    depth_range: tuple[float, float]
    clip_eps: float | None = None  # clamp depth from below before inverting

    def encode(self, depth: jnp.ndarray) -> jnp.ndarray:
        d = depth
        if self.clip_eps is not None:
            d = jnp.maximum(d, self.clip_eps)
        inv = 1.0 / (d + self.shift)
        unit = (inv - self.inv_hi) / (self.inv_lo - self.inv_hi)
        return 2.0 * unit - 1.0

    def encode_masked(
        self, depth: jnp.ndarray, extrapolation_mask: jnp.ndarray
    ) -> jnp.ndarray:
        """Masked pixels get -2 (reference model.py:218,228)."""
        disp = self.encode(depth)
        return jnp.where(extrapolation_mask, -2.0, disp)

    def decode(self, disparity: jnp.ndarray) -> jnp.ndarray:
        """disparity in [-1,1] -> metric depth
        (reference inference_pipeline.py:906-911)."""
        unit = (disparity + 1.0) / 2.0
        inv = unit * (self.inv_lo - self.inv_hi) + self.inv_hi
        return 1.0 / inv - self.shift


# CLEVR-Infinite: depth in [7, 16], disparity from 1/d
# (reference model.py:220-229, clip at 1e-7 for warped depth :225).
CLEVR_CODEC = DepthCodec(
    name="clevr-infinite",
    shift=0.0,
    inv_lo=1.0 / 7.0,
    inv_hi=1.0 / 16.0,
    depth_range=(7.0, 16.0),
    clip_eps=1e-7,
)

# GoogleEarth-Infinite: depth shifted +10, range [0.099975586, 4.765625]
# (reference model.py:210-219; configs depth_range).
GOOGLE_EARTH_CODEC = DepthCodec(
    name="google_earth",
    shift=10.0,
    inv_lo=1.0 / 10.099975586,
    inv_hi=1.0 / 14.765625,
    depth_range=(0.099975586, 4.765625),
)

# KITTI-360: depth in [3, 75] (a vestigial branch in the reference —
# inference_pipeline.py:908, data/base.py:155-158 — kept for parity).
KITTI360_CODEC = DepthCodec(
    name="kitti360",
    shift=0.0,
    inv_lo=1.0 / 3.0,
    inv_hi=1.0 / 75.0,
    depth_range=(3.0, 75.0),
)

CODECS = {
    "clevr-infinite": CLEVR_CODEC,
    "google_earth": GOOGLE_EARTH_CODEC,
    "kitti360": KITTI360_CODEC,
}


def get_codec(dataset: str) -> DepthCodec:
    if dataset not in CODECS:
        raise KeyError(f"no depth codec for dataset {dataset!r}")
    return CODECS[dataset]
