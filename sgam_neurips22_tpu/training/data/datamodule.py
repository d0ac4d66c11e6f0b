"""Data module: phase-switched datasets + batched device-bound loader.

Rebuild of reference data/utils/utils.py `DataModuleFromConfig` (:196-311):
phase 'conditional_generation' wires the pose-graph pair datasets, phase
'codebook' the file-list RGB-D datasets; test split = validation (:281).

The loader replaces torch DataLoader worker processes with a thread-pool
prefetcher feeding jax.device_put (TPU-idiomatic host->device pipelining:
the next batch is assembled and transferred while the step runs).
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

from sgam_neurips22_tpu.core.registry import register
from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
from sgam_neurips22_tpu.training.data.pair_dataset import (
    ClevrInfinitePairs,
    GoogleEarthPairs,
)

PAIR_DATASETS = {
    "clevr-infinite": ClevrInfinitePairs,
    "google_earth": GoogleEarthPairs,
}


class Loader:
    """Shuffling batcher with background prefetch + parallel example decode.

    drop_last is always on for train (static shapes keep XLA happy); val
    mirrors the reference's drop_last=True (data/utils/utils.py:299-311).

    Examples within a batch are decoded on a thread pool (PIL/numpy release
    the GIL, so image decode + resize parallelize) — the TPU-side equivalent
    of the reference's torch DataLoader worker processes, without the fork
    overhead. Per-example RNGs are spawned from the epoch generator so
    stochastic datasets (pair-dataset source sampling) stay deterministic
    regardless of thread scheduling.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        workers: int = 8,
        device_put: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None,
        process_count: int = 1,
        process_index: int = 0,
    ):
        """batch_size is the GLOBAL batch. With process_count > 1 (multi-host
        mesh, parallel/distributed.py) every process walks the same
        epoch-seeded index order but decodes only its process_index-th slice
        of each batch — the DistributedSampler discipline — and device_put
        (shard_local_batch) assembles the global device array."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.workers = max(1, workers)
        self.device_put = device_put
        if batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {process_count} processes"
            )
        self.process_count = process_count
        self.process_index = process_index
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx

    def _local(self, idxs):
        """This process's rows of one global batch (identity single-host)."""
        if self.process_count <= 1:
            return slice(None)
        local_bs = len(idxs) // self.process_count
        return slice(self.process_index * local_bs, (self.process_index + 1) * local_bs)

    def _assemble(self, idxs, rng, pool) -> Dict[str, np.ndarray]:
        sl = self._local(idxs)
        if hasattr(self.dataset, "assemble_batch"):
            # packed-shard fast path: one native call builds the whole batch
            # in C++ threads (no per-example Python, no thread pool)
            return self.dataset.assemble_batch(idxs[sl])
        # spawn per-GLOBAL-position RNGs before slicing so a multi-host run
        # decodes example i with the same stream as a single-host run
        rngs = rng.spawn(len(idxs))[sl]
        idxs = idxs[sl]

        def get_one(i, r):
            try:
                return self.dataset.__getitem__(int(i), rng=r)
            except TypeError:
                return self.dataset[int(i)]

        if pool is None:
            examples = [get_one(i, r) for i, r in zip(idxs, rngs)]
        else:
            examples = list(pool.map(get_one, idxs, rngs))
        return {
            k: np.stack([e[k] for e in examples]) for k in examples[0]
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        self._epoch += 1
        rng = np.random.default_rng(self.seed + 1000 + self._epoch)
        n = len(self)
        if n == 0:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        # bound NOW: at interpreter shutdown the queue module's globals may
        # already be cleared, and a late `queue.Empty` lookup in the
        # generator's finally would raise its own TypeError
        empty_exc = queue.Empty
        cancelled = threading.Event()
        pool = (
            ThreadPoolExecutor(self.workers, thread_name_prefix="loader")
            if self.workers > 1
            else None
        )

        def put_or_cancel(item) -> bool:
            # never block forever on a consumer that went away (early break
            # out of the epoch, e.g. max_steps): poll the cancel flag
            while not cancelled.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in range(n):
                    if cancelled.is_set():
                        return
                    batch = self._assemble(
                        idx[b * self.batch_size : (b + 1) * self.batch_size],
                        rng, pool,
                    )
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    if not put_or_cancel(batch):
                        return
                put_or_cancel(stop)
            except RuntimeError as e:
                # pool shutdown mid-assemble (early consumer exit or
                # interpreter teardown) is expected cancellation, not an
                # error to surface
                if "shutdown" in str(e) and (
                    cancelled.is_set() or (pool is not None and pool._shutdown)
                ):
                    return
                put_or_cancel(e)
            except BaseException as e:  # propagate to the consumer
                put_or_cancel(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            cancelled.set()
            # unblock a producer stuck in q.put and drop device batches
            try:
                while True:
                    q.get_nowait()
            except empty_exc:
                pass
            t.join(timeout=5.0)
            if pool is not None:
                pool.shutdown(wait=False)


@register(
    "sgam_neurips22_tpu.DataModule",
    "data.utils.utils.DataModuleFromConfig",  # reference YAML alias
)
class DataModule:
    """Phase-switched dataset wiring (reference data/utils/utils.py:196-311)."""

    def __init__(
        self,
        batch_size: int,
        dataset: str,
        phase: str,
        dataset_dir: str,
        image_resolution=(256, 256),
        n_src: int = 2,
        num_workers: int = 0,  # accepted for config parity; loader uses threads
        depth_range=None,
        use_depth: bool = True,
        seed: int = 0,
        device_put=None,
        packed: str | bool = "auto",
        process_count: int = 1,
        process_index: int = 0,
        **_: Any,
    ):
        self.batch_size = batch_size
        self.seed = seed
        self.device_put = device_put
        self.process_count = process_count
        self.process_index = process_index
        if phase == "conditional_generation":
            cls = PAIR_DATASETS[dataset]
            self.train_ds = cls(
                "train", dataset_dir, n_src, image_resolution,
                frame_store=self._frame_store(
                    "train", dataset_dir, image_resolution, packed
                ),
            )
            self.val_ds = cls(
                "val", dataset_dir, n_src, image_resolution,
                frame_store=self._frame_store(
                    "val", dataset_dir, image_resolution, packed
                ),
            )
        elif phase == "codebook":
            self.train_ds = self._codebook_ds(
                "train", dataset_dir, dataset, image_resolution, use_depth, packed
            )
            self.val_ds = self._codebook_ds(
                "val", dataset_dir, dataset, image_resolution, use_depth, packed
            )
        else:
            raise NotImplementedError(phase)
        self.test_ds = self.val_ds  # reference :281

    @staticmethod
    def _frame_store(split, dataset_dir, image_resolution, packed):
        """Packed frame store for the pair datasets (tools/pack_dataset.py
        --phase pair), same packed=True/'auto'/False semantics."""
        from sgam_neurips22_tpu.training.data.packed import (
            PackedFrameStore,
            frame_store_path,
        )

        if not packed:
            return None
        path = frame_store_path(dataset_dir, split, image_resolution)
        if os.path.exists(path):
            try:
                return PackedFrameStore(path)
            except Exception as e:
                # 'auto' must fall back on ANY packed-path failure — the
                # native loader can raise CalledProcessError (no toolchain),
                # RuntimeError (stale-ABI .so), or JSONDecodeError
                # (truncated sidecar), not just OSError
                if packed is True:
                    raise
                print(f"packed frame store unusable ({e}); falling back to PNGs")
        elif packed is True:
            raise FileNotFoundError(
                f"packed=True but no frame store at {path}; run "
                "tools/pack_dataset.py --phase pair"
            )
        return None

    @staticmethod
    def _codebook_ds(split, dataset_dir, dataset, image_resolution, use_depth, packed):
        """Prefer a packed SGPK shard (tools/pack_dataset.py) when present:
        native C++ batch assembly, bit-identical examples. packed=True
        requires the shard; 'auto' falls back to per-PNG decode; False
        disables the packed path."""
        from sgam_neurips22_tpu.training.data.packed import (
            PackedCodebookDataset,
            shard_path,
        )

        if packed:
            path = shard_path(dataset_dir, split, image_resolution)
            if os.path.exists(path):
                try:
                    ds = PackedCodebookDataset(path)
                    want = 4 if use_depth else 3
                    if ds.channels != want:
                        ds.close()
                        raise OSError(
                            f"shard has {ds.channels} channels, config wants {want}"
                        )
                    return ds
                except Exception as e:
                    # see _frame_store: 'auto' falls back on any failure mode
                    if packed is True:
                        raise
                    print(f"packed shard unusable ({e}); falling back to PNGs")
            elif packed is True:
                raise FileNotFoundError(
                    f"packed=True but no shard at {path}; run tools/pack_dataset.py"
                )
        return CodebookDataset(
            split, dataset_dir, dataset, image_resolution, use_depth=use_depth
        )

    def _loader(self, ds, shuffle: bool = False) -> Loader:
        # val/test keep the default seed (their order is sequential; the
        # epoch rng only drives train-side stochastic source sampling)
        return Loader(
            ds, self.batch_size, shuffle=shuffle,
            seed=self.seed if shuffle else 0,
            device_put=self.device_put,
            process_count=self.process_count, process_index=self.process_index,
        )

    def train_loader(self) -> Loader:
        return self._loader(self.train_ds, shuffle=True)

    def val_loader(self) -> Loader:
        return self._loader(self.val_ds)

    def test_loader(self) -> Loader:
        return self._loader(self.test_ds)
