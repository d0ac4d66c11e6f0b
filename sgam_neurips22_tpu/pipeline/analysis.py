"""Mask analysis utilities.

Rebuild of reference inference_pipeline.py `find_extrapolation_region`
(:961-990): connected components of the extrapolation mask, keeping regions
larger than an area threshold. Not used by the main generation path in
either codebase; useful for diagnosing how much of each frame the model
must hallucinate.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected component labelling of a boolean mask (iterative BFS).

    Returns (labels [H, W] int32 with 0 = background, n_components)."""
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    current = 0
    for sy in range(h):
        for sx in range(w):
            if not mask[sy, sx] or labels[sy, sx]:
                continue
            current += 1
            stack = [(sy, sx)]
            labels[sy, sx] = current
            while stack:
                y, x = stack.pop()
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not labels[ny, nx]:
                        labels[ny, nx] = current
                        stack.append((ny, nx))
    return labels, current


def find_extrapolation_regions(
    mask: np.ndarray, min_area: int = 4000
) -> List[Dict]:
    """Regions of the extrapolation mask larger than `min_area` pixels
    (reference threshold, inference_pipeline.py:961-990).

    Returns a list of {label, area, bbox (y0, x0, y1, x1)}."""
    labels, n = connected_components(mask.astype(bool))
    out = []
    for lbl in range(1, n + 1):
        ys, xs = np.nonzero(labels == lbl)
        area = len(ys)
        if area > min_area:
            out.append(
                {
                    "label": lbl,
                    "area": int(area),
                    "bbox": (int(ys.min()), int(xs.min()), int(ys.max()), int(xs.max())),
                }
            )
    return out
