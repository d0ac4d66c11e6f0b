"""On-device scalable TSDF map: scatter-band fusion + surface-pool rendering.

Replaces the reference's Open3D C++ mapping surface (SURVEY.md section 2.9):
- `ScalableTSDFVolume.integrate(rgbd, K, T)` (inference_pipeline.py:777):
  the reference volume is voxel-hashed and unbounded — it only touches
  voxels inside the truncation band around each depth sample. `integrate`
  here does the TPU-native equivalent: per-pixel SCATTER of the band samples
  along each ray (O(pixels x band), independent of volume size), instead of
  projecting every voxel into the frame (O(voxels), the round-1 design that
  could not scale past ~8M voxels).
- mesh extraction + `OffscreenRenderer.render_to_depth_image`
  (inference_pipeline.py:786-827) -> `render_depth`: the default 'splat'
  method forward-splats an incrementally-maintained SURFACE-VOXEL POOL
  through a packed z-buffer (O(pool), again volume-size independent), with
  sub-voxel refinement against the TSDF and median hole filling. Classic
  two-level raycasting is kept as a fallback method. Parity with the
  reference's *mesh-rasterized* depth is at the PSNR level, not bit-exact
  (SURVEY.md hard part #2).

Storage is a dense [X, Y, Z] float32 grid of SIGNED TSDF SUMS (Curless-
Levoy averaging as running sums; every sample adds weight 1, so
sign(sum) == sign(mean) and zero crossings of the sum ARE the fused
surface). Measured on v5e (NOTES.md round 2): a scalar f32 scatter-add runs
~9 ns/element, while a [N, 2]-row scatter hits an ~80 ns/row slow path —
storing (sum, count) pairs would cost 10x. The observation count is not
stored at all: 'observed' == sum != 0. The surface set lives in the POOL
(`pool_ids` + `cell_counts`); its cross-frame dedup registry is `inpool`,
a claim-sized hashed table of voxel ids (NOT a per-voxel bitmap: the
round-4 per-voxel `flags` put two 65k-element scatters into a
volume-sized array every frame — 11.2 ms/frame page-miss-bound on the
440M-voxel google_earth volume, the single largest block in the
map-requery trace. The table is exact-by-value: a bucket registers a
specific voxel id, so a hash collision can only cause a DUPLICATE pool
slot — identical render output, slightly more recycling pressure — never
a wrong value. Volumes that fit the table, including every test volume,
keep bit-exact round-4 semantics). Volume bounds come from `auto_config`
(trajectory ∪ viewing-frustum hull, memory-capped); fusion telemetry
(`vol.stats`) counts valid vs fused samples so truncation is loud, never
silent.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgam_neurips22_tpu.geometry.camera import inv3x3, pixel_grid

# packed z-buffer key layout: 12 bits quantized depth + 20 bits pool index
_POOL_IDX_BITS = 20
MAX_POOL_CAPACITY = 1 << _POOL_IDX_BITS
# claim-grid key layout (integrate's pool dedup): FIXED position width so
# keys from calls with different ray counts (resolutions / strides) stay
# comparable in one volume; 2^18 rays covers 512x512 frames. int32 leaves
# 31-18 = 13 bits of frame headroom -> 8191 integrate() calls per volume
# (reference scenes: <= 400). Beyond that the frame key CLAMPS: overflow
# cannot corrupt existing state, but in-frame dedup degrades (clamped
# frames share keys, so re-touched voxels stop entering the pool) —
# `fusion_fraction` reports it and the pipeline warns.
_CLAIM_POS_BITS = 18
CLAIM_MAX_FRAMES = (1 << (31 - _CLAIM_POS_BITS)) - 1  # 8191


def _use_pool_splat_pallas(override: Optional[bool] = None) -> bool:
    """Route the pool-splat z-buffer through the binned Pallas min-merge
    (ops/splat_pallas.py) instead of per-chunk XLA scatter-mins. Output is
    bit-identical (same per-chunk winner keys, same merge); SPEED depends on
    how row-coherent consecutive pool slots project — slots book in ray
    scanline order within a frame, so bulk bookings are coherent, but
    cross-frame seams, sparse late bookings, and above all RECYCLING (ring
    overwrites interleave booking frames within a kernel chunk) widen
    spans. Measured on v5e (2026-08-20, NOTES.md round 5): CLEVR
    map-requery 22.2 -> 24.2 fps (+9%, modest recycling, 57k slots); GE
    30-frame a wash (27.5 vs 27.6); GE 100-frame (1.2M recycled slots)
    catastrophically slower — the run exceeded 4x the XLA wall clock and
    was killed, so google_earth keeps the XLA scatter. Resolution:
    SGAM_TPU_TSDF_POOL_PALLAS=0/1 (overrides everything, both ways), then
    the caller's `override` (the pipeline carries the per-dataset measured
    default), then OFF."""
    flag = os.environ.get("SGAM_TPU_TSDF_POOL_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if override is not None:
        return override
    return False


def validate_ray_budget(image_size: Tuple[int, int], stride: int) -> None:
    """Fail FAST (config time, not deep inside a jitted unroll) when the
    per-frame fused-ray count exceeds the claim-key capacity.

    512x512 at stride 1 sits exactly at the 2^18 limit; anything larger
    needs `tsdf_integrate_stride` >= ceil(max(H, W)/512)."""
    h, w = image_size
    rays = -(-h // stride) * (-(-w // stride))
    if rays > (1 << _CLAIM_POS_BITS):
        need = 1
        while (-(-h // need)) * (-(-w // need)) > (1 << _CLAIM_POS_BITS):
            need += 1
        raise ValueError(
            f"rgbd integration at {h}x{w} with tsdf_integrate_stride={stride} "
            f"fuses {rays} rays/frame, over the 2^{_CLAIM_POS_BITS} claim-key "
            f"capacity; set tsdf_integrate_stride>={need} (voxel footprints "
            f"span ~2 px at working depths, so stride 2 is near-lossless)"
        )


@dataclass(frozen=True)
class TSDFConfig:
    dims: Tuple[int, int, int]  # voxels per axis (X, Y, Z)
    voxel_size: float  # meters (0.05 CLEVR / 0.01 GE, inference_pipeline.py:121-131)
    sdf_trunc: float  # truncation distance (10*voxel CLEVR / 0.03 GE)
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # world min corner
    depth_trunc: float = 20.0  # ignore depth beyond (reference :776 depth_trunc=20)
    band_voxels: Optional[int] = None  # band half-width in voxels (None = auto)
    # surface-voxel pool slots; pools beyond 2^20 render in chunks of 2^20
    # (splat cost is linear in capacity either way)
    pool_capacity: int = 1 << 19
    # full-pool policy: True (default) recycles the OLDEST slots ring-buffer
    # style — the newest observed surface always enters the map, matching
    # the reference's unbounded ScalableTSDFVolume semantics
    # (inference_pipeline.py:122-131) under a bounded memory budget. False
    # reverts to drop-new (round-2 behavior: a full pool stops updating).
    # Either way the event is counted in `stats`, never silent.
    pool_recycle: bool = True
    # integrate every s-th ray (1 = all pixels, the reference behavior); the
    # band scatter is the fusion cost and scales 1/s^2 — see integrate()
    integrate_stride: int = 1
    # pool-splat chunk granularity: within each cell, the render scatter
    # runs in sub-chunks of this size and sub-chunks beyond the cell's live
    # count are skipped (projection AND scatter), so a finer chunk makes
    # early/sparse frames pay only for the slots actually filled. Must be
    # <= 2^20 (the packed-key index width).
    render_chunk: int = 1 << 18
    # SPATIAL pool cells: the pool is partitioned into n_cells independent
    # ring allocators, one per equal slab of the volume along its longest
    # axis. A surface voxel always lands in its own slab's slots, so every
    # slot range has STATIC spatial bounds and the splat frustum-culls
    # whole cells exactly — cost O(live slots in visible cells), not
    # O(pool capacity). (The round-3 design appended slots globally; once
    # the ring wrapped, grow-only chunk bboxes inflated to the whole volume
    # and the cull died — the google_earth map-requery regression.)
    # None = one cell per render_chunk's worth of capacity, capped at 64.
    pool_cells: Optional[int] = None
    # memory LAYOUT of the flat grid/flags/claim arrays: linear index
    # (g[o0] * D[o1] + g[o1]) * D[o2] + g[o2]. Purely a performance knob —
    # values are identical for any order — but it decides whether
    # integrate's scatters stream or thrash: candidates arrive in image
    # scanline order, so the INNERMOST axis (o2) should be the world axis
    # the camera's u-axis sweeps. With the default identity order the
    # google_earth volume put that axis OUTERMOST (stride 739k elements =
    # 3 MB between adjacent pixels' voxels: every scatter element a
    # TLB/row miss, ~90 ns each vs the ~9 ns streaming floor).
    # auto_config derives it from the trajectory's camera axes.
    axis_order: Tuple[int, int, int] = (0, 1, 2)
    # claim-table size = min(n_voxels, 2^claim_bits). The claim's only job
    # is in-frame pool dedup (generation-keyed; see integrate), so it does
    # not need per-voxel addressing: volumes beyond 2^claim_bits voxels
    # HASH voxel ids into the table (Knuth multiplicative). A hash collision
    # merely defers one colliding candidate's pool entry to a later frame
    # (~65k candidates into 2^24 buckets: ~100 colliding pairs per frame,
    # ~0.2% of entries; the TSDF field itself is always exact). The win is
    # memory AND scatter latency: the google_earth volume's per-voxel claim
    # was 1.76 GB and its 65k-element claim scatter ran ~90 ns/element
    # (DRAM page misses); a 67 MB table brings it near the ~10-20 ns
    # small-array floor. Raise to 32+ for exact dedup on any volume.
    claim_bits: int = 24

    def __post_init__(self):
        if int(np.prod(self.dims)) >= 2**31:
            raise ValueError(f"dims {self.dims} overflow int32 linear indexing")
        if not (0 < self.render_chunk <= (1 << 20)):
            raise ValueError(f"render_chunk {self.render_chunk} not in (0, 2^20]")
        if self.band_voxels is not None and not (1 <= self.band_voxels <= 8):
            # 0 would silently fuse nothing (empty depth maps); the auto
            # path clamps to the same [1, 8] range
            raise ValueError(f"band_voxels {self.band_voxels} not in [1, 8]")
        if self.pool_cells is not None and not (
            1 <= self.pool_cells <= self.dims[self.split_axis]
        ):
            raise ValueError(
                f"pool_cells {self.pool_cells} not in [1, "
                f"dims[{self.split_axis}]={self.dims[self.split_axis]}]"
            )
        if tuple(sorted(self.axis_order)) != (0, 1, 2):
            raise ValueError(f"axis_order {self.axis_order} is not a permutation")

    @property
    def split_axis(self) -> int:
        """Volume axis the pool cells slab along (the longest: long
        trajectories extend the volume along their motion axis, which is
        exactly the axis behind-the-camera culling pays off on)."""
        return int(np.argmax(self.dims))

    @property
    def n_cells(self) -> int:
        if self.pool_cells is not None:
            return self.pool_cells
        auto = -(-self.pool_capacity // self.render_chunk)
        return int(np.clip(auto, 1, min(64, self.dims[self.split_axis])))

    @property
    def cell_cap(self) -> int:
        """Slots per cell; the allocated pool is n_cells * cell_cap
        (>= pool_capacity, rounded up to an equal per-cell split)."""
        return -(-self.pool_capacity // self.n_cells)

    @property
    def capacity(self) -> int:
        """Effective pool slots actually allocated."""
        return self.cell_cap * self.n_cells

    @property
    def chunk(self) -> int:
        """Render sub-chunk size actually used by the pool splat."""
        return min(self.cell_cap, self.render_chunk)

    def cell_bounds(self) -> list:
        """Static per-cell voxel-coordinate ranges [(lo, hi_exclusive)]
        along split_axis: coord c belongs to cell (c * n_cells) // dims."""
        d = self.dims[self.split_axis]
        c = self.n_cells
        return [(-(-k * d // c), -(-(k + 1) * d // c)) for k in range(c)]

    @property
    def band(self) -> int:
        """Half-width of the fused band, in voxels (capped: band samples are
        the integrate cost, O(pixels x 2*band) scatter-adds per frame)."""
        if self.band_voxels is not None:
            return self.band_voxels
        return int(np.clip(round(self.sdf_trunc / self.voxel_size), 1, 8))

    @property
    def trunc(self) -> float:
        """Effective truncation distance = fused band extent."""
        return self.band * self.voxel_size

    @property
    def claim_size(self) -> int:
        return min(int(np.prod(self.dims)), 1 << self.claim_bits)

    def claim_index(self, lin: jnp.ndarray) -> jnp.ndarray:
        """Voxel linear id -> claim-table slot (identity when the volume
        fits the table; Knuth multiplicative hash beyond)."""
        if int(np.prod(self.dims)) <= self.claim_size:
            return lin
        h = lin.astype(jnp.uint32) * jnp.uint32(2654435761)
        return (h >> jnp.uint32(32 - self.claim_bits)).astype(jnp.int32)

    def lin_index(self, g: jnp.ndarray) -> jnp.ndarray:
        """Voxel coords [..., 3] (world axis order) -> flat index, laid out
        per `axis_order`."""
        o0, o1, o2 = self.axis_order
        d = self.dims
        return (g[..., o0] * d[o1] + g[..., o1]) * d[o2] + g[..., o2]

    def unlin_index(self, lin: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Flat index -> (x, y, z) voxel coords in WORLD axis order."""
        o0, o1, o2 = self.axis_order
        d = self.dims
        c = [None, None, None]
        c[o2] = lin % d[o2]
        c[o1] = (lin // d[o2]) % d[o1]
        c[o0] = lin // (d[o1] * d[o2])
        return tuple(c)


@struct.dataclass
class TSDFVolume:
    # FLAT [X*Y*Z] f32 signed tsdf-contribution sums. Stored 1-D on purpose:
    # integrate/render index it linearly, and a [X,Y,Z] array would make
    # every `.reshape(-1)` a LAYOUT change that XLA lowers to a
    # slice-by-slice copy loop — measured 27 ms/frame on the google_earth
    # volume (~450M voxels): two while-of-dynamic-slice copies bracketing
    # the band scatter, each far below memcpy speed. 1-D arrays have a
    # trivial layout, so the scatter updates in place.
    grid: jnp.ndarray
    # [cfg.claim_size] int32 pool-membership registry: bucket
    # claim_index(v) holds v+1 while (it believes) voxel v is in the pool,
    # 0 when empty. Exact-by-value (see module docstring): identity-mapped
    # volumes reproduce the old per-voxel flags bit-for-bit; hashed volumes
    # trade rare duplicate pool slots for volume-size-independent scatters.
    inpool: jnp.ndarray
    # [n_cells * cell_cap] int32 linear voxel ids; cell k owns the slot
    # range [k * cell_cap, (k+1) * cell_cap) and only stores voxels whose
    # split-axis coordinate lies in that cell's static slab — the splat's
    # frustum cull rests on this invariant
    pool_ids: jnp.ndarray
    # [n_cells] int32 LIFETIME slots booked per cell (ring position when
    # recycling; live slots per cell = min(count, cell_cap))
    cell_counts: jnp.ndarray
    stats: jnp.ndarray  # [4] f32: (valid samples, fused samples, pool drops, pool recycles)
    # persistent in-frame dedup grid: each integrate() writes generation-keyed
    # entries (frame << pos_bits | reversed pixel pos) via ONE scatter-max, so
    # no per-frame O(volume) memset is needed (a fresh 30M-int32 claim grid
    # cost ~0.8 ms/frame); stale keys from earlier frames always lose the max
    frame: jnp.ndarray  # [] int32 frames integrated so far
    # [cfg.claim_size] int32 generation-keyed claim entries (hashed voxel
    # ids when the volume exceeds 2^claim_bits voxels; see TSDFConfig)
    claim: jnp.ndarray

    @property
    def pool_count(self) -> jnp.ndarray:
        """Total LIFETIME slots booked across cells."""
        return self.cell_counts.sum()

    @property
    def tsdf(self) -> jnp.ndarray:
        """Mean-sign TSDF in [-1, 1], FLAT [X*Y*Z] (sums clipped; sign
        matches the mean — unobserved voxels read 0, gate on `weight`).
        Reshape with cfg.dims for a 3-D view (host-side exports do)."""
        return jnp.clip(self.grid, -1.0, 1.0)

    @property
    def weight(self) -> jnp.ndarray:
        """Observedness indicator, FLAT [X*Y*Z] (any band sample touched)."""
        return (self.grid != 0.0).astype(jnp.float32)


def create_volume(cfg: TSDFConfig, n_scenes: int = 1) -> TSDFVolume:
    """One TSDF volume, or `n_scenes` independent volumes in ONE state.

    Batched volumes keep the same flat layout with the scene axis FOLDED
    into the leading dimension (scene s owns grid[s*V:(s+1)*V], cell range
    [s*C, (s+1)*C), ...): integrate/render then batch as pure index
    arithmetic — scene offsets added to the same single scatters — instead
    of vmapping, which would lower every scatter to the measured ~80 ns/row
    [N, 2]-row slow path (NOTES.md round 2). Scene blocks are contiguous, so
    sharding the leading axis over a data mesh places whole scenes per
    device (the multi-chip serving layout)."""
    x, y, z = cfg.dims
    s = int(n_scenes)
    return TSDFVolume(
        grid=jnp.zeros(s * x * y * z, jnp.float32),
        inpool=jnp.zeros(s * cfg.claim_size, jnp.int32),
        pool_ids=jnp.zeros(s * cfg.capacity, jnp.int32),
        cell_counts=jnp.zeros(s * cfg.n_cells, jnp.int32),
        stats=jnp.zeros(4, jnp.float32),
        frame=jnp.zeros((), jnp.int32),
        claim=jnp.zeros(s * cfg.claim_size, jnp.int32),
    )


def volume_scenes(vol: TSDFVolume, cfg: TSDFConfig) -> int:
    """Number of scenes folded into a (possibly batched) volume state."""
    return vol.cell_counts.shape[0] // cfg.n_cells


def auto_config(
    c2ws: np.ndarray,
    intrinsics: np.ndarray,
    image_size: Tuple[int, int],
    depth_range: Tuple[float, float],
    voxel_size: float,
    sdf_trunc: float,
    mem_cap_bytes: float = 6e9,
    pool_capacity: Optional[int] = None,
    band_voxels: Optional[int] = None,
    integrate_stride: int = 1,
    render_chunk: Optional[int] = None,  # None = TSDFConfig default
    pool_recycle: bool = True,
    pool_cells: Optional[int] = None,  # None = auto (see TSDFConfig)
    verbose: bool = True,
) -> TSDFConfig:
    """Size/place the volume from the trajectory ∪ viewing-frustum hull.

    The reference's `ScalableTSDFVolume` is unbounded (voxel-hashed,
    inference_pipeline.py:122-131); the TPU-native equivalent is a dense
    grid guaranteed to CONTAIN everything the cameras can observe: the
    convex hull of every camera's frustum slab between 0.8*near_depth and
    1.2*far_depth (generated depth decodes into [near, far] up to model
    error). If that exceeds `mem_cap_bytes`, the voxel size is coarsened
    (loudly) rather than silently cropping the scene.

    Args:
      c2ws: [G, 4, 4] camera-to-world transforms (OpenCV convention).
      intrinsics: [3, 3].
      image_size: (H, W).
      depth_range: (lo, hi) metric z-depth the dataset codec can produce.
      pool_capacity: surface-pool slots; None = 6 x the largest volume face
        (one voxel per surface crossing per face-column plus slack),
        clamped to [2^16, 4*2^20] — the splat renderer chunks pools beyond
        the 2^20 packed-key limit.
    """
    h, w = image_size
    lo, hi = depth_range
    near = max(0.8 * lo - sdf_trunc, 1e-3)
    far = 1.2 * hi + sdf_trunc
    corners = np.array(
        [[0, 0, 1], [w, 0, 1], [0, h, 1], [w, h, 1], [w / 2, h / 2, 1]], np.float64
    )
    rays = corners @ np.linalg.inv(np.asarray(intrinsics, np.float64)).T  # unit z
    pts = []
    for c2w in np.asarray(c2ws, np.float64):
        for d in (near, far):
            cam_pts = rays * d  # z-depth parameterization
            world = cam_pts @ c2w[:3, :3].T + c2w[:3, 3]
            pts.append(world)
    pts = np.concatenate(pts, axis=0)
    lo_b = pts.min(axis=0) - 2 * voxel_size
    hi_b = pts.max(axis=0) + 2 * voxel_size

    vox = float(voxel_size)
    while True:
        dims = np.maximum(np.ceil((hi_b - lo_b) / vox).astype(int), 4)
        n_vox = int(np.prod(dims))
        # grid f32 + claim & inpool tables i32 (each hash-capped at 2^24)
        mem = n_vox * 4 + 2 * min(n_vox, 1 << 24) * 4
        if mem <= mem_cap_bytes and n_vox < 2**31:
            break
        vox *= 2 ** (1.0 / 3.0)
    if vox != voxel_size and verbose:
        n_orig = float(np.prod(np.ceil((hi_b - lo_b) / voxel_size)))
        print(
            f"WARNING: TSDF volume at voxel {voxel_size} would need "
            f"{n_orig:.3g} voxels; coarsened to voxel {vox:.4f} to fit "
            f"{mem_cap_bytes / 1e9:.1f} GB"
        )
    if pool_capacity is None:
        # 6 voxels per cell of the largest volume face: room for one surface
        # crossing per column plus slack for noisy / multi-layer geometry
        # (4x overflowed by ~5% on the CLEVR template bench scene). Pools
        # beyond the 2^20 packed-key limit splat in chunks (cost stays
        # linear in capacity); cap at 4 chunks to bound the render cost.
        faces = (
            dims[0] * dims[1], dims[0] * dims[2], dims[1] * dims[2],
        )
        pool_capacity = int(
            np.clip(6 * max(faces), 1 << 16, 4 * MAX_POOL_CAPACITY)
        )
    # memory layout from the trajectory's camera frame: innermost axis = the
    # world axis the image u-axis sweeps (scanline-adjacent integrate
    # candidates become memory-adjacent), middle = the v-swept axis, outer =
    # the remainder (~the view direction for a downward camera). See
    # TSDFConfig.axis_order.
    r_mean = np.mean([c[:3, :3] for c in np.asarray(c2ws, np.float64)], axis=0)
    o2 = int(np.argmax(np.abs(r_mean[:, 0])))  # u axis
    v_abs = np.abs(r_mean[:, 1]).copy()
    v_abs[o2] = -1.0
    o1 = int(np.argmax(v_abs))
    o0 = 3 - o1 - o2
    extra = {} if render_chunk is None else {"render_chunk": render_chunk}
    return TSDFConfig(
        dims=tuple(int(d) for d in dims),
        voxel_size=vox,
        sdf_trunc=sdf_trunc if vox == voxel_size else sdf_trunc * vox / voxel_size,
        origin=tuple(float(v) for v in lo_b),
        band_voxels=band_voxels,
        pool_capacity=pool_capacity,
        integrate_stride=integrate_stride,
        pool_recycle=pool_recycle,
        pool_cells=pool_cells,
        axis_order=(o0, o1, o2),
        **extra,
    )


def _camera_rays(intrinsics: jnp.ndarray, extrinsic: jnp.ndarray, h: int, w: int):
    """(camera center [3], world ray dirs [H, W, 3] with unit z in cam frame):
    points along a ray at parameter t have CAMERA Z-DEPTH exactly t."""
    pix = pixel_grid(h, w)  # [H, W, 3] (u, v, 1)
    k_inv = inv3x3(intrinsics)
    dirs_cam = jnp.einsum("ij,hwj->hwi", k_inv, pix)
    r = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    cam_center = -r.T @ t
    dirs_world = jnp.einsum("ji,hwj->hwi", r, dirs_cam)
    return cam_center, dirs_world


def integrate(
    vol: TSDFVolume,
    cfg: TSDFConfig,
    depth: jnp.ndarray,
    rgb: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsic: jnp.ndarray,
) -> TSDFVolume:
    """Fuse one RGB-D frame (Curless-Levoy running average, as running sums).

    For every valid pixel, 2*band samples along the ray at voxel spacing
    centered on the measured surface scatter-add their (constant per band
    slot) tsdf contribution into the grid — the same truncation-band-only
    update the reference's scalable volume performs, O(H*W*band) regardless
    of volume size, as ONE scalar f32 scatter (the measured fast path; see
    module docstring). The two samples straddling the surface also enter the
    surface-voxel pool, deduplicated exactly (in-frame via a transient claim
    grid, across frames via `flags`) for O(pool) depth rendering.

    Batched volumes (create_volume(cfg, n_scenes=S)) fuse S frames — one per
    scene — in the SAME single scatters, with scene offsets folded into the
    indices (never vmap: a vmapped scatter lowers to the ~80 ns/row
    [N, 2]-row slow path, NOTES.md round 2). The S=1 path is bit-identical
    to the historical unbatched implementation (element order preserved).

    Args:
      depth: [H, W] or [S, H, W] z-depth (0 = invalid).
      rgb: color — unused in the hot loop (color is reconstructed
        at export time from the frame buffers; see `colorize_points`).
      intrinsics: [3, 3]; extrinsic: [4, 4] or [S, 4, 4] world->camera.
    """
    del rgb  # color handled at export (keeps the in-loop state 5 bytes/voxel)
    if depth.ndim == 2:
        depth = depth[None]
    if extrinsic.ndim == 2:
        extrinsic = jnp.broadcast_to(extrinsic[None], (depth.shape[0], 4, 4))
    ns, h, w = depth.shape
    n_vox = int(np.prod(cfg.dims))
    if vol.cell_counts.shape[0] != ns * cfg.n_cells:
        raise ValueError(
            f"integrate: volume holds {volume_scenes(vol, cfg)} scene(s) but "
            f"depth batches {ns}"
        )
    band = cfg.band
    k2 = 2 * band
    dims = cfg.dims
    cam_center, dirs_world = jax.vmap(
        lambda e: _camera_rays(intrinsics, e, h, w)
    )(extrinsic)  # [S, 3], [S, H, W, 3]
    s = cfg.integrate_stride
    if s > 1:
        # ray subsampling: the scatter-add is the integrate cost (O(rays x
        # band) at ~9 ns/sample); when the voxel footprint spans >= s pixels
        # (both reference datasets: ~1.8-2.5 px at working depth), stride-s
        # rays still touch every band voxel. Pixel centers stay at their
        # original positions.
        depth = depth[:, ::s, ::s]
        dirs_world = dirs_world[:, ::s, ::s]

    valid = (depth > 0) & (depth < cfg.depth_trunc)
    # sample offsets in z: +-(0.5, 1.5, ..., band-0.5) voxels around the surface
    offsets = (jnp.arange(k2, dtype=jnp.float32) + 0.5 - band) * cfg.voxel_size
    zs = depth[..., None] + offsets  # [S, H, W, K2]
    pts = (
        cam_center[:, None, None, None, :]
        + dirs_world[..., None, :] * zs[..., None]
    )  # [S, H, W, K2, 3]
    g = jnp.floor((pts - jnp.asarray(cfg.origin)) / cfg.voxel_size).astype(jnp.int32)
    inb = (
        (g[..., 0] >= 0) & (g[..., 0] < dims[0])
        & (g[..., 1] >= 0) & (g[..., 1] < dims[1])
        & (g[..., 2] >= 0) & (g[..., 2] < dims[2])
    )
    ok = valid[..., None] & inb & (zs > 0)
    # scene offset folds the batch into the flat grid index
    scene_off = (jnp.arange(ns, dtype=jnp.int32) * n_vox)[:, None, None, None]
    lin = cfg.lin_index(g) + scene_off
    lin = jnp.where(ok, lin, 0)
    # sdf at a sample z along the ray is (measured_depth - z) = -offset:
    # constant per band slot.
    contrib_t = jnp.clip(-offsets / cfg.trunc, -1.0, 1.0)
    # masked samples contribute exactly 0.0 at index 0 — a value no-op, so no
    # scatter mode="drop" bookkeeping is needed.
    vals = contrib_t * ok.astype(jnp.float32)  # [S, H, W, K2]
    # scatter with the BAND axis outermost: consecutive scatter elements are
    # then neighboring pixels' voxels at the same band slot — memory-adjacent
    # under the u-aligned axis_order — instead of one ray's 6 band samples
    # striding ~X elements apart
    grid = vol.grid.at[
        jnp.moveaxis(lin, -1, 0).reshape(-1)
    ].add(jnp.moveaxis(vals, -1, 0).reshape(-1))

    # --- telemetry: did the valid samples land inside the volume?
    center_ok = ok[..., band - 1] | ok[..., band]
    n_valid = jnp.sum(valid.astype(jnp.float32))
    n_fused = jnp.sum((valid & center_ok).astype(jnp.float32))

    # --- surface pool: ONE voxel per surface crossing (the sample just in
    # front of the measured depth; the splat renderer's refinement step
    # recovers the sub-voxel crossing from the band field around it).
    # Exact in-frame dedup WITHOUT a sort (1M-element sort measured ~28 ms on
    # v5e) and WITHOUT a per-frame O(volume) memset: scatter-MAX a
    # generation-keyed entry (frame << pos_bits | reversed pixel position)
    # into the persistent claim grid; entries from earlier frames always
    # lose, and a candidate is this frame's winner iff it reads itself back
    # (ties broken toward the smallest pixel position, as before).
    rays = depth.shape[1] * depth.shape[2]
    cand = lin[..., band - 1].reshape(ns, rays)  # scene-offset linear ids
    cand_lo = cand - scene_off[..., 0, 0]  # within-scene ids (claim hash/cells)
    cand_ok = ok[..., band - 1].reshape(ns, rays)
    if rays > (1 << _CLAIM_POS_BITS):
        raise ValueError(
            f"integrate: {rays} rays exceed the claim-key capacity "
            f"2^{_CLAIM_POS_BITS}; raise integrate_stride or _CLAIM_POS_BITS"
        )
    pmask = (1 << _CLAIM_POS_BITS) - 1
    pos = jnp.arange(rays, dtype=jnp.int32)[None]
    fkey = jnp.minimum(vol.frame + 1, CLAIM_MAX_FRAMES)  # no int32 overflow
    own = (fkey << _CLAIM_POS_BITS) | (pmask - pos)
    own = jnp.broadcast_to(own, (ns, rays))
    # hashed claim slot on volumes beyond 2^claim_bits voxels (identity
    # otherwise): a collision defers one candidate's pool entry to a later
    # frame — the fused field above is exact either way (TSDFConfig).
    claim_off = (jnp.arange(ns, dtype=jnp.int32) * cfg.claim_size)[:, None]
    cslot = cfg.claim_index(cand_lo) + claim_off
    claim = vol.claim.at[cslot.reshape(-1)].max(
        jnp.where(cand_ok, own, 0).reshape(-1)
    )
    first = cand_ok & (claim[cslot] == own)
    # cross-frame pool dedup through the hashed registry (same slot indexing
    # as the claim): ONE gather from a claim-sized table instead of the
    # round-4 volume-sized flags array, whose 65k-element scatters were the
    # map-requery trace's largest block (module docstring)
    new = first & (vol.inpool[cslot] != cand_lo + 1)

    # --- spatial-cell slot allocation: a candidate voxel always books a
    # slot inside its own slab's cell (see TSDFConfig.pool_cells), so the
    # splat can frustum-cull whole cells from their STATIC bounds. Per-cell
    # ranks via a [S, N, C] one-hot cumsum (C <= 64: a few MB of i32,
    # ordinary vector work — no sort, no row scatter).
    n_cells, cell_cap = cfg.n_cells, cfg.cell_cap
    axis_coord = g[..., band - 1, cfg.split_axis].reshape(ns, rays)
    cell = jnp.clip(
        (axis_coord * n_cells) // cfg.dims[cfg.split_axis], 0, n_cells - 1
    )
    onehot = (cell[..., None] == jnp.arange(n_cells)) & new[..., None]
    ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=1)  # [S, N, C] inclusive
    booked = ranks[:, -1]  # [S, C] new slots booked per cell this frame
    rank = jnp.take_along_axis(ranks, cell[..., None], axis=2)[..., 0]  # 1-based
    gcell = cell + (jnp.arange(ns, dtype=jnp.int32) * n_cells)[:, None]
    counts = vol.cell_counts[gcell]
    slots = counts + rank - 1  # lifetime position in cell
    # one frame can book at most `cell_cap` slots per cell (an in-frame
    # ring wrap would double-book a slot inside a single scatter); excess
    # is dropped and counted either way.
    fits = new & (slots < counts + cell_cap)
    pool_oob = vol.pool_ids.shape[0]  # definitely-dropped scatter index
    inpool_oob = vol.inpool.shape[0]  # definitely-dropped scatter index
    if cfg.pool_recycle:
        # full cell: recycle its OLDEST slots (per-cell ring buffer) so the
        # newest observed surface always enters the map — bounded-memory
        # parity with the reference's unbounded ScalableTSDFVolume.
        # Deregister the current occupants of reused slots (clear their
        # registry bucket) so the evicted voxels can re-enter when next
        # observed. Evicted ids are disjoint from this frame's additions
        # (additions read "not registered"; occupants are registered), so
        # on identity-mapped volumes the registry updates commute; on
        # hashed volumes the add runs AFTER the clear and wins the bucket.
        slot = jnp.where(fits, gcell * cell_cap + slots % cell_cap, pool_oob)
        reused = fits & (slots >= cell_cap)
        evict = vol.pool_ids[slot] - scene_off[..., 0, 0]  # within-scene ids
        eslot = jnp.where(
            reused, cfg.claim_index(evict) + claim_off, inpool_oob
        )
        # .min(0): identical to set(0) for the non-negative registry values,
        # but deterministic under duplicate bucket indices (hash collisions)
        inpool0 = vol.inpool.at[eslot.reshape(-1)].min(
            jnp.zeros(eslot.size, jnp.int32), mode="drop"
        )
        n_recycled = jnp.sum(reused.astype(jnp.float32))
    else:
        fits = fits & (slots < cell_cap)
        slot = jnp.where(fits, gcell * cell_cap + slots, pool_oob)
        inpool0 = vol.inpool
        n_recycled = jnp.float32(0.0)
    pool_ids = vol.pool_ids.at[slot.reshape(-1)].set(cand.reshape(-1), mode="drop")
    # register this frame's additions: .max keeps the scatter deterministic
    # when distinct voxels hash-collide in one frame (the bigger id wins the
    # bucket; the loser re-enters as a duplicate slot when next observed)
    aslot = jnp.where(fits, cslot, inpool_oob)
    inpool = inpool0.at[aslot.reshape(-1)].max(
        (cand_lo + 1).reshape(-1), mode="drop"
    )
    n_dropped = jnp.sum((new & ~fits).astype(jnp.float32))
    dropped_per_cell = jnp.sum(
        (onehot & (new & ~fits)[..., None]).astype(jnp.int32), axis=1
    )  # [S, C]

    return TSDFVolume(
        grid=grid,
        inpool=inpool,
        pool_ids=pool_ids,
        cell_counts=vol.cell_counts + (booked - dropped_per_cell).reshape(-1),
        stats=vol.stats + jnp.stack([n_valid, n_fused, n_dropped, n_recycled]),
        frame=vol.frame + 1,
        claim=claim,
    )


def fusion_fraction(vol: TSDFVolume) -> Tuple[float, float, float, float]:
    """(fused/valid fraction, valid samples, pool drops, pool recycles) —
    host helper for the silent-truncation telemetry."""
    s = np.asarray(vol.stats)
    frac = float(s[1] / s[0]) if s[0] > 0 else 1.0
    return frac, float(s[0]), float(s[2]), float(s[3])


# --------------------------------------------------------------------------
# rendering
# --------------------------------------------------------------------------
def _sample_grid(
    vol: TSDFVolume, cfg: TSDFConfig, pts: jnp.ndarray, interp: str,
    scene_off=0,
):
    """Sample (tsdf sum, observed) at world points [..., 3]. One scalar
    gather per sample point on the 'nearest' fast path. `scene_off` (int or
    broadcastable int32 array) selects the scene block of a batched volume."""
    dims = jnp.asarray(cfg.dims)
    if interp == "nearest":
        g = jnp.round(
            (pts - jnp.asarray(cfg.origin)) / cfg.voxel_size - 0.5
        ).astype(jnp.int32)
        inb = jnp.all((g >= 0) & (g < dims), axis=-1)
        gc = jnp.clip(g, 0, dims - 1)
        # gather through the LINEARIZED grid: the 3-D multi-index gather here
        # traced at ~17 ns/sample (refine step, NOTES.md) vs the ~9 ns/elem
        # scalar-gather floor that 1-D index arithmetic achieves elsewhere
        # (integrate/pool paths); identical values either way
        v = vol.grid[cfg.lin_index(gc) + scene_off]
        return v, inb & (v != 0.0)
    # trilinear over the sum field
    g = (pts - jnp.asarray(cfg.origin)) / cfg.voxel_size - 0.5
    g0 = jnp.floor(g)
    frac = g - g0
    g0 = g0.astype(jnp.int32)
    vals = 0.0
    obs = jnp.ones(pts.shape[:-1], bool)
    flat = vol.grid  # already flat: see the nearest path above
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = g0 + jnp.asarray([dx, dy, dz])
                inb = jnp.all((idx >= 0) & (idx < dims), axis=-1)
                ic = jnp.clip(idx, 0, dims - 1)
                v = flat[cfg.lin_index(ic) + scene_off]
                wgt = (
                    jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                    * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                    * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                )
                vals = vals + wgt * v
                obs = obs & inb & (v != 0.0)
    return vals, obs


def _render_depth_splat(
    vol: TSDFVolume,
    cfg: TSDFConfig,
    intrinsics: jnp.ndarray,
    extrinsic: jnp.ndarray,
    image_size: Tuple[int, int],
    near: float,
    far: float,
    refine: bool = True,
    cull: bool = True,
    pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Target-view z-depth by splatting the surface-voxel pool through one
    packed scatter-min z-buffer (12-bit quantized z + 20-bit pool index in a
    uint32 key — same trick as geometry/splat.py, which measured ~3x faster
    than separate min+gather+min passes), then sub-voxel refinement against
    the TSDF along each hit ray and 3x3 median hole filling.

    Cost is O(live slots in frustum-visible cells): every pool cell has
    STATIC spatial bounds (TSDFConfig.pool_cells), so cells wholly outside
    the target frustum skip projection AND scatter via lax.cond, and within
    a visible cell, render_chunk-sized sub-chunks beyond the cell's live
    count are skipped too. `cull=False` disables the frustum cull (testing:
    culling must be exactly output-invariant).

    Batched volumes render S target views (extrinsic [S, 4, 4], one per
    scene) in the SAME per-chunk scatters with the scene axis folded into
    the z-buffer pixel index (output [S, H, W]); S=1 / [4, 4] extrinsics
    reproduce the historical single-scene path bit-for-bit."""
    h, w = image_size
    dims = cfg.dims
    squeeze = extrinsic.ndim == 2
    if squeeze:
        extrinsic = extrinsic[None]
    ns = extrinsic.shape[0]
    n_vox = int(np.prod(dims))
    if vol.cell_counts.shape[0] != ns * cfg.n_cells:
        raise ValueError(
            f"render: volume holds {volume_scenes(vol, cfg)} scene(s) but "
            f"extrinsics batch {ns}"
        )
    r = extrinsic[:, :3, :3]  # [S, 3, 3]
    t = extrinsic[:, :3, 3]  # [S, 3]
    ids = vol.pool_ids.reshape(ns, cfg.capacity)
    counts = vol.cell_counts.reshape(ns, cfg.n_cells)

    def cam_coords(idc: jnp.ndarray) -> jnp.ndarray:
        """Within-scene linear voxel ids [S, N] -> per-scene camera-frame
        coordinates [S, N, 3] of voxel centers."""
        vx, vy, vz = cfg.unlin_index(idc)
        centers = (
            jnp.stack([vx, vy, vz], axis=-1).astype(jnp.float32) + 0.5
        ) * cfg.voxel_size + jnp.asarray(cfg.origin)
        return jnp.einsum("sij,snj->sni", r, centers) + t[:, None]

    sentinel = jnp.uint32(0xFFFFFFFF)
    chunk = cfg.chunk
    cell_cap = cfg.cell_cap
    scene_off = jnp.arange(ns, dtype=jnp.int32)[:, None] * n_vox

    # --- static world-space cell boxes -> per-cell visibility [S, C] (one
    # tiny vectorized 8-corner check; bounds are compile-time constants)
    corners = np.empty((cfg.n_cells, 8, 3), np.float32)
    for ci, (alo, ahi) in enumerate(cfg.cell_bounds()):
        lo = np.zeros(3)
        hi = np.asarray(dims, np.float64).copy()
        lo[cfg.split_axis] = alo
        hi[cfg.split_axis] = ahi
        lo = lo * cfg.voxel_size + np.asarray(cfg.origin)
        hi = hi * cfg.voxel_size + np.asarray(cfg.origin)
        sel = np.array(
            [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], np.float64
        )
        corners[ci] = lo * (1 - sel) + hi * sel
    cam_c = (
        jnp.einsum("sij,ckj->scki", r, jnp.asarray(corners))
        + t[:, None, None]
    )  # [S, C, 8, 3]
    z_c = cam_c[..., 2]
    all_behind = jnp.all(z_c < max(near, 1e-3), axis=-1)
    all_beyond = jnp.all(z_c > far, axis=-1)
    # image-bounds cull is only conservative when the whole box is in front
    # of the camera (projection of a convex set then lies in the hull of
    # the projected vertices)
    zs_c = jnp.maximum(z_c, 1e-6)
    u_c = intrinsics[0, 0] * cam_c[..., 0] / zs_c + intrinsics[0, 2]
    v_c = intrinsics[1, 1] * cam_c[..., 1] / zs_c + intrinsics[1, 2]
    all_front = jnp.all(z_c > 1e-3, axis=-1)
    off_image = all_front & (
        jnp.all(u_c < -0.5, axis=-1) | jnp.all(u_c >= w - 0.5, axis=-1)
        | jnp.all(v_c < -0.5, axis=-1) | jnp.all(v_c >= h - 0.5, axis=-1)
    )
    visible = ~(all_behind | all_beyond | off_image)  # [S, C]
    if not cull:
        visible = jnp.ones_like(visible)

    pix_scene_off = (jnp.arange(ns, dtype=jnp.int32) * (h * w))[:, None]
    best = None
    chunk_sel = jnp.zeros((ns * h * w,), jnp.int32)
    starts = []  # within-scene pool offset of each sub-chunk (static)
    use_pallas = _use_pool_splat_pallas(pallas)
    pallas_pk = []  # per-sub-chunk (pix, key) when the Pallas merge is on
    for ci in range(cfg.n_cells):
        live = jnp.minimum(counts[:, ci], cell_cap)  # [S]
        for k in range(-(-cell_cap // chunk)):
            c0 = ci * cell_cap + k * chunk
            c1 = min(c0 + chunk, (ci + 1) * cell_cap)

            def chunk_pix_key(c0=c0, c1=c1, k=k, live=live, ci=ci, pad=False):
                """This sub-chunk's (local pixel ids [S, N], packed uint32
                keys [S, N]); invalid points carry pixel 0 / sentinel key.
                pad=True right-pads a cell's short tail sub-chunk to `chunk`
                (fixed shapes for the stacked Pallas batch)."""
                vid = ids[:, c0:c1] - scene_off  # within-scene voxel ids
                cam = cam_coords(vid)  # [S, chunk, 3]
                z = cam[..., 2]
                zs = jnp.maximum(z, 1e-6)
                u = intrinsics[0, 0] * cam[..., 0] / zs + intrinsics[0, 2]
                v = intrinsics[1, 1] * cam[..., 1] / zs + intrinsics[1, 2]
                ui = jnp.floor(u + 0.5).astype(jnp.int32)
                vi = jnp.floor(v + 0.5).astype(jnp.int32)
                active = (
                    jnp.arange(k * chunk, k * chunk + (c1 - c0), dtype=jnp.int32)[None]
                    < live[:, None]
                )
                valid = (
                    active
                    & visible[:, ci : ci + 1]
                    & (z > max(near, 1e-3))
                    & (z < far)
                    & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
                )
                pix = jnp.where(valid, vi * w + ui, 0)
                zq = jnp.clip(
                    (z - near) / (far - near) * 4095.0, 0, 4095
                ).astype(jnp.uint32)
                key = (zq << _POOL_IDX_BITS) | jnp.arange(
                    c1 - c0, dtype=jnp.uint32
                )[None]
                key = jnp.where(valid, key, sentinel)
                if pad and c1 - c0 < chunk:
                    padw = ((0, 0), (0, chunk - (c1 - c0)))
                    pix = jnp.pad(pix, padw)
                    key = jnp.pad(key, padw, constant_values=sentinel)
                return pix, key

            gate = jnp.any((live > k * chunk) & visible[:, ci])
            if use_pallas:
                # defer: one zbuffer_min call merges every sub-chunk below
                pallas_pk.append(jax.lax.cond(
                    gate,
                    lambda f=chunk_pix_key: f(pad=True),
                    lambda: (
                        jnp.zeros((ns, chunk), jnp.int32),
                        jnp.full((ns, chunk), sentinel, jnp.uint32),
                    ),
                ))
                starts.append(c0)
                continue

            def scatter_chunk(f=chunk_pix_key):
                pix, key = f()
                return (
                    jnp.full((ns * h * w,), sentinel, jnp.uint32)
                    .at[(pix + pix_scene_off).reshape(-1)]
                    .min(key.reshape(-1), mode="drop")
                )

            win = jax.lax.cond(
                gate,
                scatter_chunk,
                lambda: jnp.full((ns * h * w,), sentinel, jnp.uint32),
            )
            if best is None:
                best = win
            else:
                chunk_sel = jnp.where(win < best, len(starts), chunk_sel)
                best = jnp.minimum(best, win)
            starts.append(c0)
    if use_pallas:
        # ONE binned Pallas z-buffer call over every (sub-chunk, scene) as
        # the kernel batch axis (ops/splat_pallas.py — same kernel as the
        # geometry splat), then the SAME uint32 min + chunk_sel merge as the
        # XLA path: per-chunk winner images are bit-identical to the
        # per-chunk scatter-min (the kernel's contract), so the final depth
        # is too. uint32 keys ride the int32 kernel through a sign-bit flip
        # (order-preserving; the 0xFFFFFFFF sentinel maps exactly to the
        # kernel's INT32_MAX empty marker).
        from sgam_neurips22_tpu.ops.splat_pallas import zbuffer_min

        nck = len(pallas_pk)
        pix_all = jnp.stack([p for p, _ in pallas_pk]).reshape(nck * ns, chunk)
        key_all = jnp.stack([kk for _, kk in pallas_pk]).reshape(nck * ns, chunk)
        key_i = jax.lax.bitcast_convert_type(
            key_all ^ jnp.uint32(0x80000000), jnp.int32
        )
        win_i = zbuffer_min(
            pix_all, key_i, h, w, interpret=jax.default_backend() != "tpu"
        )
        wins = (
            jax.lax.bitcast_convert_type(win_i, jnp.uint32)
            ^ jnp.uint32(0x80000000)
        ).reshape(nck, ns * h * w)
        best = wins[0]
        for i in range(1, nck):
            chunk_sel = jnp.where(wins[i] < best, i, chunk_sel)
            best = jnp.minimum(best, wins[i])
    has = best != sentinel
    idx = jnp.where(
        has,
        jnp.asarray(starts, jnp.int32)[chunk_sel]
        + (best & (MAX_POOL_CAPACITY - 1)).astype(jnp.int32),
        0,
    ).reshape(ns, h * w)
    # recompute the winners' depth from their voxel ids (z is no longer
    # materialized for the whole pool — only per chunk, and only for chunks
    # in use)
    win_vid = jnp.take_along_axis(ids, idx, axis=1) - scene_off
    depth = jnp.where(
        has.reshape(ns, h * w), cam_coords(win_vid)[..., 2], 0.0
    ).reshape(ns, h, w)

    if refine:
        # sub-voxel zero-crossing around the splatted depth: the pool voxel
        # sits ~0.5 voxel in FRONT of the surface, so 3 samples at
        # {0, +0.5, +1} voxels bracket the crossing (2 candidate intervals).
        # (A 2-sample {0, 1} variant was measured ~1.1 ms/frame cheaper but
        # degraded flat-wall depth beyond the 0.05 test tolerance — the
        # nearest-voxel grid read is piecewise constant, so the middle
        # sample genuinely halves the crossing quantization.)
        cam_center, dirs_world = jax.vmap(
            lambda e: _camera_rays(intrinsics, e, h, w)
        )(extrinsic)
        dt = 0.5 * cfg.voxel_size
        offs = jnp.arange(3, dtype=jnp.float32) * dt
        ts = depth[..., None] + offs
        pts = (
            cam_center[:, None, None, None, :]
            + dirs_world[:, :, :, None, :] * ts[..., None]
        )
        vals, obs = _sample_grid(
            vol, cfg, pts, "nearest",
            scene_off=scene_off.reshape(ns, 1, 1, 1),
        )
        prev_v, next_v = vals[..., :-1], vals[..., 1:]
        good = (prev_v > 0) & (next_v < 0) & obs[..., :-1] & obs[..., 1:]
        # only 2 candidate intervals: select beats a take_along_axis gather
        # (values where neither interval is good are discarded via `hit`)
        g0 = good[..., 0]
        hit = g0 | good[..., 1]
        pv = jnp.where(g0, prev_v[..., 0], prev_v[..., 1])
        nv = jnp.where(g0, next_v[..., 0], next_v[..., 1])
        first = jnp.where(g0, 0.0, 1.0)
        frac = pv / jnp.maximum(pv - nv, 1e-12)
        t_ref = depth + (first + frac) * dt
        depth = jnp.where(hit & (depth > 0), t_ref, depth)

    # hole filling: one pool point per surface crossing leaves coverage gaps
    # up to ~2 px when the voxel footprint is below a pixel (the reference
    # rasterizes a continuous mesh instead). A 3x3 median can only fill
    # holes with >=5 covered neighbors, so fill with the MIN nonzero
    # neighbor instead (z-buffer-consistent: the nearest surface wins),
    # two passes for 2-px gaps.
    big = jnp.float32(3.4e38)
    for _ in range(2):
        d = jnp.where(depth == 0.0, big, depth)
        p = jnp.pad(d, ((0, 0), (1, 1), (1, 1)), constant_values=big)
        neigh = jnp.stack(
            [
                p[:, dy : dy + h, dx : dx + w]
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        ).min(axis=-1)
        fill = jnp.where(neigh < big, neigh, 0.0)
        depth = jnp.where(depth == 0.0, fill, depth)
    return depth[0] if squeeze else depth


def _render_depth_raycast(
    vol: TSDFVolume,
    cfg: TSDFConfig,
    intrinsics: jnp.ndarray,
    extrinsic: jnp.ndarray,
    image_size: Tuple[int, int],
    near: float,
    far: float,
    n_samples: int = 192,
    interp: str = "nearest",
) -> jnp.ndarray:
    """Classic two-level coarse->fine zero-crossing raycast (fallback /
    quality path; O(rays * samples))."""
    h, w = image_size
    cam_center, dirs_world = _camera_rays(intrinsics, extrinsic, h, w)

    def find_crossing(t_starts, dt, s):
        ts = t_starts[..., None] + dt * jnp.arange(s, dtype=jnp.float32)
        pts = (
            cam_center[None, None, None, :]
            + dirs_world[:, :, None, :] * ts[..., None]
        )
        vals, obs = _sample_grid(vol, cfg, pts, interp)
        prev_v, next_v = vals[..., :-1], vals[..., 1:]
        crossing = (prev_v > 0) & (next_v < 0) & obs[..., :-1] & obs[..., 1:]
        first = jnp.argmax(crossing, axis=-1)
        hit = jnp.any(crossing, axis=-1)
        pv = jnp.take_along_axis(prev_v, first[..., None], axis=-1)[..., 0]
        nv = jnp.take_along_axis(next_v, first[..., None], axis=-1)[..., 0]
        t_lo = t_starts + first * dt
        return t_lo, pv, nv, hit

    n_coarse = max(n_samples // 4, 2)
    n_fine = 8
    dt_coarse = (far - near) / (n_coarse - 1)
    t0 = jnp.full((h, w), near, jnp.float32)
    t_lo, _, _, hit_c = find_crossing(t0, dt_coarse, n_coarse)
    dt_fine = dt_coarse / (n_fine - 1)
    t_lo_f, pv, nv, hit_f = find_crossing(t_lo, dt_fine, n_fine)
    hit = hit_c & hit_f
    frac = pv / jnp.maximum(pv - nv, 1e-12)
    depth = t_lo_f + dt_fine * frac
    return jnp.where(hit, depth, 0.0)


def render_depth(
    vol: TSDFVolume,
    cfg: TSDFConfig,
    intrinsics: jnp.ndarray,
    extrinsic: jnp.ndarray,
    image_size: Tuple[int, int],
    near: float,
    far: float,
    n_samples: int = 192,
    method: str = "splat",
    interp: str = "nearest",
    refine: bool = True,
    pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Render the map's z-depth at a target pose [H, W] (0 = no surface).

    Replaces the reference's mesh + OffscreenRenderer re-query
    (`render_to_depth_image(z_in_view_space=True)`, inference_pipeline.py:825;
    Inf->0 mapping at :827). method='splat' is the O(pool) fast path and
    accepts batched volumes + extrinsics [S, 4, 4] (output [S, H, W]);
    method='raycast' marches rays through the grid ('interp' selects
    nearest/trilinear sampling), single-scene only."""
    if method != "splat" and extrinsic.ndim == 3:
        raise NotImplementedError(
            "batched map rendering supports method='splat' only"
        )
    if method == "splat":
        return _render_depth_splat(
            vol, cfg, intrinsics, extrinsic, image_size, near, far,
            refine=refine, pallas=pallas,
        )
    return _render_depth_raycast(
        vol, cfg, intrinsics, extrinsic, image_size, near, far,
        n_samples=n_samples, interp=interp,
    )


# --------------------------------------------------------------------------
# export (host-side)
# --------------------------------------------------------------------------
def extract_points(
    vol: TSDFVolume, cfg: TSDFConfig, max_abs_tsdf: float = 1.0, scene: int = 0
):
    """Surface point cloud (the reference's `volume.extract_point_cloud()`
    -> .ply, inference_pipeline.py:447): the LIVE surface-pool voxels (the
    band samples straddling a measured depth; exactly the set the splat
    renderer draws from), optionally filtered to |clipped sum| <
    max_abs_tsdf. Host-side; colors via `colorize_points` (gray if never
    colorized). `scene` selects one block of a batched volume."""
    n_vox = int(np.prod(cfg.dims))
    ids = np.asarray(vol.pool_ids).reshape(-1, cfg.n_cells, cfg.cell_cap)[scene]
    counts = np.asarray(vol.cell_counts).reshape(-1, cfg.n_cells)[scene]
    live = np.minimum(counts, cfg.cell_cap)
    sel = [ids[c, : live[c]] for c in range(cfg.n_cells) if live[c] > 0]
    if not sel:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    # pool ids store scene-offset linear ids; duplicates are possible on
    # hash-collided registrations (hashed volumes only) — unique() folds them
    lin = np.unique(np.concatenate(sel)) - scene * n_vox
    g = np.asarray(vol.grid[scene * n_vox : (scene + 1) * n_vox])
    keep = np.abs(np.clip(g[lin], -1.0, 1.0)) < max_abs_tsdf + 1e-9
    lin = lin[keep]
    x, y, z = cfg.unlin_index(lin)
    idx = np.stack([x, y, z], axis=-1)
    pts = (idx + 0.5) * cfg.voxel_size + np.asarray(cfg.origin)
    cols = np.full((len(pts), 3), 0.5, np.float32)
    return pts.astype(np.float32), cols


def colorize_points(
    pts: np.ndarray,
    rgbs: np.ndarray,
    depths: np.ndarray,
    intrinsics: np.ndarray,
    w2cs: np.ndarray,
    tol: float,
) -> np.ndarray:
    """Assign colors to surface points by reprojection into the source
    frames (first frame whose depth agrees within `tol` wins). The in-loop
    TSDF state intentionally carries no color (scalar scatter is the only
    fast path; see module docstring). The reference gets colors from
    `volume.integrate`'s color average — export-only parity, reconstructed
    here from the frame buffers.

    Args:
      rgbs: [N, H, W, 3] in [-1, 1]; depths: [N, H, W]; w2cs: [N, 4, 4].
    """
    n, h, w = depths.shape[:3]
    cols = np.full((len(pts), 3), 0.5, np.float32)
    done = np.zeros(len(pts), bool)
    k = np.asarray(intrinsics, np.float64)
    for i in range(n):
        if done.all():
            break
        t = np.asarray(w2cs[i], np.float64)
        cam = pts @ t[:3, :3].T + t[:3, 3]
        z = cam[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.floor(k[0, 0] * cam[:, 0] / z + k[0, 2] + 0.5).astype(np.int64)
            v = np.floor(k[1, 1] * cam[:, 1] / z + k[1, 2] + 0.5).astype(np.int64)
        ok = (z > 1e-3) & (u >= 0) & (u < w) & (v >= 0) & (v < h) & ~done
        uu = np.clip(u, 0, w - 1)
        vv = np.clip(v, 0, h - 1)
        d = depths[i][vv, uu]
        ok &= np.abs(d - z) < tol
        cols[ok] = (rgbs[i][vv[ok], uu[ok]] + 1.0) / 2.0
        done |= ok
    return cols
