"""Benchmark: generated 256^2 RGB-D frames/sec on one chip.

Runs the flagship CLEVR-Infinite conditional-generation loop (splat
conditioning, topk=1, num_src=5 — BASELINE.json config #2/#4) on whatever
accelerator `jax.devices()` offers, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}
vs_baseline is measured against the driver's north-star target of 20
frames/sec/chip (BASELINE.md; the reference repo publishes no throughput
numbers of its own).

Random weights are used when no converted checkpoint is present — weight
values do not change the compute graph or its speed.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_FPS = 20.0


def main() -> None:
    from sgam_neurips22_tpu.models import init_vqmodel
    from sgam_neurips22_tpu.pipeline.scene_generation import (
        InfiniteSceneGeneration,
        SceneGenConfig,
    )
    from __graft_entry__ import _flagship_configs

    model_cfg = _flagship_configs()
    params = init_vqmodel(jax.random.PRNGKey(0), model_cfg)

    rows, cols = 6, 6
    cfg = SceneGenConfig(
        dataset="clevr-infinite",
        output_dim=(rows, cols),
        topk=1,
        use_rgbd_integration=False,
    )
    rng = np.random.default_rng(0)
    seed_rgb = rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32)
    seed_depth = rng.uniform(8, 14, (256, 256)).astype(np.float32)
    gen = InfiniteSceneGeneration(
        params, model_cfg, cfg, seeds=[((0, 0), seed_rgb, seed_depth)]
    )

    key = jax.random.PRNGKey(3)
    # warm-up: compile the step
    key, k = jax.random.split(key)
    gen.one_step_prediction(gen.order[gen.curr], k)
    gen.curr += 1
    jax.block_until_ready(gen.rgb_buf)

    n_timed = 0
    t0 = time.perf_counter()
    while gen.curr < rows * cols:
        key, k = jax.random.split(key)
        gen.one_step_prediction(gen.order[gen.curr], k)
        gen.curr += 1
        n_timed += 1
    jax.block_until_ready(gen.rgb_buf)
    dt = time.perf_counter() - t0

    fps = n_timed / dt
    print(
        json.dumps(
            {
                "metric": "generated 256^2 RGB-D frames/sec/chip (CLEVR conditional step, topk=1, 5 srcs)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
