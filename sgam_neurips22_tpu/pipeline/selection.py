"""Source-view selection for each generation step.

Rebuild of reference inference_pipeline.py `get_src_grid_coords` (:507-531):
all already-visited poses within a per-dataset radius of the target
(1.0 CLEVR / 0.3 otherwise), sorted by distance, truncated to num_src;
'trajectory'-shaped runs instead take the previous num_src frames.
Host-side numpy (the pose table is planning data, not device state).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from sgam_neurips22_tpu.pipeline.trajectory import PoseGrid

RADIUS = {"clevr-infinite": 1.0}
DEFAULT_RADIUS = 0.3


def source_radius(dataset: str) -> float:
    return RADIUS.get(dataset, DEFAULT_RADIUS)


def get_closest_anchor(
    grid: PoseGrid, anchor_indices: Sequence[int], tgt_idx: int
) -> int:
    """Index of the nearest anchor (seed) pose to the target (reference
    `get_closest_anchor`, inference_pipeline.py:423-431; unused in the main
    path there too)."""
    pos = grid.position[list(anchor_indices)]
    d = np.linalg.norm(pos - grid.position[tgt_idx], axis=1)
    return int(anchor_indices[int(np.argmin(d))])


def select_sources(
    grid: PoseGrid,
    visit_order: Sequence[Tuple[int, int]],
    curr: int,
    tgt_coord: Tuple[int, int],
    num_src: int,
    dataset: str,
) -> List[Tuple[int, int]]:
    """Coordinates of the source views for the `curr`-th generation step."""
    if grid.trajectory_shape == "trajectory":
        return [(tgt_coord[0] - i - 1, 0) for i in range(num_src)]
    tgt_pos = grid.position[grid.index(*tgt_coord)]
    radius = source_radius(dataset)
    cands = []
    for i in range(curr):
        coord = visit_order[i]
        idx = grid.index(*coord)
        if not grid.visited[idx]:
            continue
        dist = float(np.linalg.norm(grid.position[idx] - tgt_pos))
        if dist <= radius:
            cands.append((coord, dist))
    cands.sort(key=lambda x: x[1])
    return [c for c, _ in cands[:num_src]]
