"""Packed RGB-D shards: native (C++) batch assembly for the codebook phase.

The reference's data path is torch's DataLoader — native worker processes
decoding a PNG + a .npy per example on every epoch (data/base.py:30-188).
The TPU-native equivalent decodes/resizes/disparity-encodes ONCE
(tools/pack_dataset.py) into a flat mmap-able shard, and assembles
ready-to-upload float32 NHWC batches from it in C++ threads
(native/packed_loader.cpp) — no per-example Python, no per-epoch decode.

Batches are bit-identical to `CodebookDataset` (the shard stores the
post-resize uint8 RGB and the final float32 disparity channel; the C++
assembler applies the same `v / 127.5 - 1` float32 ops numpy does).

Usage:
    python tools/pack_dataset.py --dataset_dir D --dataset clevr-infinite
    # writes D/train_256x256.sgpk and D/val_256x256.sgpk; DataModule then
    # picks them up automatically for the codebook phase (packed='auto').
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Sequence

import numpy as np

MAGIC = b"SGPKv01\x00"
HEADER = np.dtype(
    [("magic", "S8"), ("n", "<u4"), ("h", "<u4"), ("w", "<u4"), ("flags", "<u4")]
)


def shard_path(dataset_dir: str, split: str, resolution) -> str:
    h, w = resolution
    return os.path.join(dataset_dir, f"{split}_{h}x{w}.sgpk")


class ShardWriter:
    """Streaming shard writer: O(1) host memory, any dataset size.

    Records append one at a time; `close()` back-patches the record count
    into the header and atomically renames the temp file into place (a
    crashed pack never leaves a readable half-shard: the temp header holds
    n=0 until close, and sgpk_open rejects n == 0)."""

    def __init__(self, path: str, has_depth: bool, raw_depth: bool = False):
        self.path = path
        self.has_depth = has_depth
        self.raw_depth = raw_depth
        self.hw = None
        self.n = 0
        self._tmp = path + ".tmp"
        self._f = open(self._tmp, "wb")
        self._f.write(b"\x00" * HEADER.itemsize)  # placeholder header

    def add(self, rgb_u8: np.ndarray, channel: np.ndarray | None = None) -> None:
        rgb = np.ascontiguousarray(rgb_u8, np.uint8)
        if rgb.ndim != 3 or rgb.shape[2] != 3:
            raise ValueError(f"record {self.n} rgb shape {rgb.shape} != (H, W, 3)")
        if self.hw is None:
            self.hw = rgb.shape[:2]
        if rgb.shape[:2] != self.hw:
            raise ValueError(f"record {self.n} rgb shape {rgb.shape} != {self.hw}")
        self._f.write(rgb.tobytes())
        if self.has_depth:
            if channel is None:
                raise ValueError("has_depth shard needs a float channel per record")
            d = np.ascontiguousarray(channel, "<f4")
            if d.shape != self.hw:
                raise ValueError(f"record {self.n} channel shape {d.shape} != {self.hw}")
            self._f.write(d.tobytes())
        self.n += 1

    def close(self) -> None:
        if self._f is None:
            return
        if self.n == 0 or self.hw is None:
            self._f.close()
            os.remove(self._tmp)
            self._f = None
            raise ValueError("empty shard")
        hdr = np.zeros((), HEADER)
        hdr["magic"] = MAGIC
        hdr["n"], (hdr["h"], hdr["w"]) = self.n, self.hw
        hdr["flags"] = (1 if self.has_depth else 0) | (2 if self.raw_depth else 0)
        self._f.seek(0)
        self._f.write(hdr.tobytes())
        self._f.close()
        self._f = None
        os.replace(self._tmp, self.path)  # atomic


def write_shard(
    path: str,
    rgb_u8: Sequence[np.ndarray],
    disparity: Sequence[np.ndarray] | None,
    raw_depth: bool = False,
) -> None:
    """Write a shard from in-memory per-record arrays (rgb [H,W,3] u8;
    disparity [H,W] f32 or None for RGB-only) — convenience wrapper over
    ShardWriter for small shards/tests. raw_depth marks the float channel
    as metric depth (pair-dataset frame stores) rather than encoded
    disparity (codebook shards) — readers check the flag so the two cannot
    be confused."""
    has_depth = disparity is not None
    wr = ShardWriter(path, has_depth=has_depth, raw_depth=raw_depth)
    for i in range(len(rgb_u8)):
        wr.add(rgb_u8[i], disparity[i] if has_depth else None)
    wr.close()


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.sgpk_open.restype = ctypes.c_void_p
    lib.sgpk_open.argtypes = [ctypes.c_char_p]
    lib.sgpk_close.argtypes = [ctypes.c_void_p]
    for f in (lib.sgpk_count, lib.sgpk_height, lib.sgpk_width, lib.sgpk_channels):
        f.restype = ctypes.c_int64
        f.argtypes = [ctypes.c_void_p]
    lib.sgpk_assemble.restype = ctypes.c_int32
    lib.sgpk_assemble.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.sgpk_gather.restype = ctypes.c_int32
    lib.sgpk_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    return lib


def read_flags(path: str) -> int:
    hdr = np.fromfile(path, dtype=HEADER, count=1)
    # numpy S8 scalars strip trailing NULs — compare against the stripped magic
    if len(hdr) != 1 or bytes(hdr[0]["magic"]) != MAGIC.rstrip(b"\x00"):
        raise OSError(f"not an SGPK shard: {path}")
    return int(hdr[0]["flags"])


class PackedCodebookDataset:
    """Codebook-phase dataset over a packed shard. Implements the standard
    per-example protocol AND `assemble_batch`, which the Loader prefers:
    one C++ call builds the whole [B, H, W, C] float32 batch."""

    def __init__(self, path: str, threads: int = 0):
        from sgam_neurips22_tpu.mapping.mesh import _load_lib

        if read_flags(path) & 2:
            raise OSError(
                f"{path} is a raw-depth frame store, not a codebook shard"
            )
        self._lib = _bind(_load_lib())
        self._h = self._lib.sgpk_open(path.encode())
        if not self._h:
            raise OSError(f"not a readable SGPK shard: {path}")
        self.path = path
        self.threads = threads
        self.height = int(self._lib.sgpk_height(self._h))
        self.width = int(self._lib.sgpk_width(self._h))
        self.channels = int(self._lib.sgpk_channels(self._h))
        self._n = int(self._lib.sgpk_count(self._h))

    def __len__(self) -> int:
        return self._n

    def assemble_batch(self, idxs) -> Dict[str, np.ndarray]:
        idx = np.ascontiguousarray(idxs, np.int64)
        out = np.empty(
            (len(idx), self.height, self.width, self.channels), np.float32
        )
        rc = self._lib.sgpk_assemble(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.threads,
        )
        if rc != 0:
            raise IndexError(f"shard index out of range (n={self._n}): {idxs}")
        return {"image": out}

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {"image": self.assemble_batch([i])["image"][0]}

    def close(self) -> None:
        if self._h:
            self._lib.sgpk_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def frame_store_path(dataset_dir: str, split: str, resolution) -> str:
    h, w = resolution
    return os.path.join(dataset_dir, f"{split}_frames_{h}x{w}.sgpk")


class PackedFrameStore:
    """Frame-level store for the pair datasets: RGB (u8, post-resize) +
    metric depth (f32, post ray->z) per frame, gathered into separate f32
    arrays by C++ threads. A JSON sidecar maps '<scene>/<im_XXXXX.png>' to
    record ids; pose-graph sampling and the relative-transform math stay in
    Python (they are microseconds — the decode was the cost)."""

    def __init__(self, path: str, threads: int = 0):
        import json

        from sgam_neurips22_tpu.mapping.mesh import _load_lib

        flags = read_flags(path)
        if not (flags & 1) or not (flags & 2):
            raise OSError(f"{path} is not a raw-depth frame store")
        self._lib = _bind(_load_lib())
        self._h = self._lib.sgpk_open(path.encode())
        if not self._h:
            raise OSError(f"not a readable SGPK shard: {path}")
        self.path = path
        self.threads = threads
        self.height = int(self._lib.sgpk_height(self._h))
        self.width = int(self._lib.sgpk_width(self._h))
        with open(path + ".idx.json") as f:
            self.index: Dict[str, int] = json.load(f)

    @staticmethod
    def key_for(rgb_path: str) -> str:
        parts = rgb_path.replace("\\", "/").split("/")
        return "/".join(parts[-2:])

    def record_id(self, rgb_path: str):
        return self.index.get(self.key_for(rgb_path))

    def covers(self, rgb_paths) -> bool:
        return all(self.record_id(p) is not None for p in rgb_paths)

    def gather(self, record_ids):
        """-> (rgb [n, H, W, 3] f32 in [-1,1], depth [n, H, W] f32)."""
        idx = np.ascontiguousarray(record_ids, np.int64)
        n = len(idx)
        rgb = np.empty((n, self.height, self.width, 3), np.float32)
        depth = np.empty((n, self.height, self.width), np.float32)
        rc = self._lib.sgpk_gather(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.threads,
        )
        if rc != 0:
            raise IndexError(f"frame-store gather failed (rc={rc}): {record_ids}")
        return rgb, depth

    def close(self) -> None:
        if self._h:
            self._lib.sgpk_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
