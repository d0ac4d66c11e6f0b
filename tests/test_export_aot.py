"""AOT export (jax.export): serialized inference-step artifacts must
round-trip and reproduce the live function exactly."""
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from export_aot import export_step  # noqa: E402

from sgam_neurips22_tpu.models import DDConfig, VQModelConfig  # noqa: E402
from sgam_neurips22_tpu.serving import build_inference_step  # noqa: E402

TINY = VQModelConfig(
    ddconfig=DDConfig(
        ch=32, out_ch=4, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), resolution=8, z_channels=32, in_channels=4,
    ),
    n_embed=16, embed_dim=32, phase="conditional_generation",
    dataset="clevr-infinite", depth_range=(7.0, 16.0),
)


def test_export_roundtrip_matches_live_call(tmp_path):
    from jax import export as jexport

    out = str(tmp_path / "step.jaxexport")
    export_step(TINY, out, platforms=["cpu"])
    assert os.path.getsize(out) > 0

    exported = jexport.deserialize(open(out, "rb").read())
    fn, args = build_inference_step(TINY, image_size=TINY.ddconfig.resolution * 4)
    live_rgb, live_depth = jax.jit(fn)(*args)
    aot_rgb, aot_depth = exported.call(*args)
    np.testing.assert_array_equal(np.asarray(live_rgb), np.asarray(aot_rgb))
    np.testing.assert_array_equal(np.asarray(live_depth), np.asarray(aot_depth))
