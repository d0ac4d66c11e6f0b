"""Metric + image logging (wandb-optional).

Replaces the reference's hardwired WandbLogger (entity/project hardcoded at
train_generative_sensing_model.py:176-182) and `ImageLogger` callback
(data/utils/utils.py:360-469) with a pluggable logger: metrics always go to
a JSONL file under the run dir; wandb is used when importable; image grids
are written as PNGs every `every_n_steps` (plus log-spaced early steps,
matching data/utils/utils.py:371).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, logdir: str, use_wandb: bool = True, project: str = "SGAM", run_name: Optional[str] = None):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=project, name=run_name, dir=logdir)
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        clean = {
            k: float(v) for k, v in metrics.items() if np.ndim(v) == 0
        }
        rec = {"step": int(step), "time": time.time(), **clean}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(clean, step=step)

    def close(self) -> None:
        self.jsonl.close()
        if self.wandb is not None:
            self.wandb.finish()


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)


def log_spaced_steps(n: int = 12, base: float = 2.0):
    """Early log-spaced image-log steps (reference data/utils/utils.py:371)."""
    return sorted({int(base**k) for k in range(n)})


class ImageLogger:
    """PNG grids of (warped input | reconstruction | ground truth) RGB and
    disparity channels under logdir/images/<split>/
    (reference ImageLogger, data/utils/utils.py:360-469)."""

    def __init__(
        self,
        logdir: str,
        every_n_steps: int = 750,
        max_images: int = 4,
        wandb_run=None,
    ):
        self.dir = os.path.join(logdir, "images")
        self.every = every_n_steps
        self.max_images = max_images
        self.early = set(log_spaced_steps())
        # reference ImageLogger also pushes grids to the wandb logger
        # (data/utils/utils.py:377-396)
        self.wandb = wandb_run

    def should_log(self, step: int) -> bool:
        return step % self.every == 0 or step in self.early

    def log(self, step: int, split: str, panels: Dict[str, np.ndarray]) -> None:
        """panels: name -> [B, H, W, C] arrays in [-1, 1] (C=3 or 1)."""
        from PIL import Image

        out = os.path.join(self.dir, split)
        os.makedirs(out, exist_ok=True)
        for name, arr in panels.items():
            arr = np.asarray(arr)[: self.max_images]
            if arr.ndim == 3:
                arr = arr[..., None]
            if arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, axis=-1)
            grid = np.concatenate(list(arr), axis=1)  # side-by-side
            Image.fromarray(_to_uint8(grid)).save(
                os.path.join(out, f"{name}_gs-{step:06d}.png")
            )
            if self.wandb is not None:
                try:
                    import wandb

                    self.wandb.log(
                        {f"{split}/{name}": wandb.Image(_to_uint8(grid))},
                        step=step,
                    )
                except Exception:
                    pass
