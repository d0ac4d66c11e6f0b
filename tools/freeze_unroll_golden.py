"""Freeze the tiny-model 3x3 splat-unroll output as a scene-level golden.

tests/goldens/*.npz pins module-level numerics (encoder/decoder/VQ/splat);
tests/test_pipeline.py::test_scene_expansion_is_deterministic only proves
WITHIN-session determinism. This golden freezes the full autoregressive
scene output (seed -> splat conditioning -> encode -> quantize -> decode ->
buffer write, 8 generated frames) at fixed seeds, so perf work on the splat
/ scatter / attention paths cannot silently drift scene-level numerics
(VERDICT round-4 weak #7; reference determinism anchor:
main_scene_generation.py:47-49 fixed seeds + disabled cudnn).

Regenerate ONLY when a numerics change is intentional:
    JAX_PLATFORMS=cpu python tools/freeze_unroll_golden.py
(the test compares on the CPU backend, where tests run).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_unroll():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from test_pipeline import TINY, TINY_K, H, W, make_seed

    from sgam_neurips22_tpu.models import init_vqmodel
    from sgam_neurips22_tpu.pipeline.scene_generation import (
        InfiniteSceneGeneration,
        SceneGenConfig,
    )

    params = init_vqmodel(jax.random.PRNGKey(0), TINY)
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(3, 3), num_src=3, topk=1,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        params, TINY, cfg, seeds=[((0, 0), rgb, depth)], intrinsics=TINY_K
    )
    rgb_buf, depth_buf = gen.scene_expansion(jax.random.PRNGKey(0))
    return np.asarray(rgb_buf), np.asarray(depth_buf)


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "unroll_3x3.npz",
    )
    rgb, depth = run_unroll()
    np.savez_compressed(out, rgb=rgb, depth=depth)
    print(f"wrote {out}: rgb {rgb.shape} mean {rgb.mean():+.6f}, "
          f"depth {depth.shape} mean {depth.mean():+.6f}")


if __name__ == "__main__":
    main()
