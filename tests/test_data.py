"""Data layer tests with synthetic on-disk datasets."""
import json
import os
import time

import numpy as np
import pytest
from PIL import Image

from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
from sgam_neurips22_tpu.training.data.datamodule import DataModule, Loader
from sgam_neurips22_tpu.training.data.io import (
    encode_disparity_np,
    load_depth,
    load_rgb,
    ray_to_z_np,
    resize_nearest,
)
from sgam_neurips22_tpu.training.data.pair_dataset import ClevrInfinitePairs

RES = (32, 32)


def write_frame(scene, i, rng):
    img = (rng.uniform(0, 255, (*RES, 3))).astype(np.uint8)
    Image.fromarray(img).save(scene / f"im_{i:05d}.png")
    np.save(scene / f"dm_{i:05d}.npy", rng.uniform(8, 14, RES).astype(np.float32))


@pytest.fixture()
def clevr_dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    k = np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]])
    np.save(tmp_path / "K.npy", k)
    for split in ("train", "val"):
        scene = tmp_path / split / "scene_0001"
        os.makedirs(scene)
        frames = []
        for i in range(6):
            c2w = np.eye(4)
            c2w[:3, 3] = [i * 0.5, 0, 0]
            frames.append({"transform_matrix": c2w.tolist(), "file_path": f"im_{i:05d}.png"})
            write_frame(scene, i, rng)
        with open(scene / "transforms.json", "w") as f:
            json.dump({"frames": frames}, f)
    return str(tmp_path)


def test_pair_dataset_shapes_and_padding(clevr_dataset_dir):
    ds = ClevrInfinitePairs("train", clevr_dataset_dir, n_src=2, image_resolution=RES)
    assert len(ds) == 6
    ex = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert ex["dst_img"].shape == (*RES, 3)
    assert ex["src_imgs"].shape == (2, *RES, 3)
    assert ex["src_depths"].shape == (2, *RES)
    assert ex["R_rels"].shape == (2, 3, 3)
    assert ex["src_masks"].shape == (2,)
    # depth got ray->z converted: must differ from raw at off-center pixels
    raw = np.load(os.path.join(clevr_dataset_dir, "train/scene_0001/dm_00000.npy"))
    assert not np.allclose(ex["dst_depth"], raw)


def test_pair_dataset_graph_caching(clevr_dataset_dir):
    ds1 = ClevrInfinitePairs("val", clevr_dataset_dir, n_src=2, image_resolution=RES)
    assert os.path.exists(os.path.join(clevr_dataset_dir, "cache"))
    ds2 = ClevrInfinitePairs("val", clevr_dataset_dir, n_src=2, image_resolution=RES)
    assert len(ds1) == len(ds2)
    # val sampling is deterministic per index
    e1 = ds1[2]
    e2 = ds2[2]
    np.testing.assert_array_equal(e1["src_imgs"], e2["src_imgs"])


def test_codebook_dataset(clevr_dataset_dir):
    scene = os.path.join(clevr_dataset_dir, "train/scene_0001")
    paths = sorted(
        os.path.join(scene, f) for f in os.listdir(scene) if f.startswith("im")
    )
    with open(os.path.join(clevr_dataset_dir, "train.txt"), "w") as f:
        f.write("\n".join(paths))
    with open(os.path.join(clevr_dataset_dir, "val.txt"), "w") as f:
        f.write("\n".join(paths))
    ds = CodebookDataset("train", clevr_dataset_dir, "clevr-infinite", RES)
    ex = ds[0]
    assert ex["image"].shape == (*RES, 4)
    assert ex["image"][..., :3].min() >= -1.0 and ex["image"][..., :3].max() <= 1.0


def test_loader_batching(clevr_dataset_dir):
    ds = ClevrInfinitePairs("train", clevr_dataset_dir, n_src=2, image_resolution=RES)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["dst_img"].shape == (2, *RES, 3)


def test_datamodule_conditional(clevr_dataset_dir):
    dm = DataModule(
        batch_size=2, dataset="clevr-infinite", phase="conditional_generation",
        dataset_dir=clevr_dataset_dir, image_resolution=RES, n_src=2,
    )
    batch = next(iter(dm.train_loader()))
    assert batch["src_imgs"].shape == (2, 2, *RES, 3)
    assert dm.test_ds is dm.val_ds  # reference: test = validation


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(13, 17)).astype(np.float32)
    ours = resize_nearest(x, 7, 5)
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[None, None], size=(7, 5)
        )[0, 0].numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_encode_disparity_ranges():
    d = np.linspace(7, 16, 100)
    disp = encode_disparity_np(d, "clevr-infinite")
    assert disp.max() <= 1 + 1e-6 and disp.min() >= -1 - 1e-6
    d = np.linspace(0.099975586, 4.765625, 100)
    disp = encode_disparity_np(d, "google_earth")
    assert disp.max() <= 1 + 1e-6 and disp.min() >= -1 - 1e-6


class _ShutdownMsgDataset:
    """Dataset whose failure message happens to contain 'shutdown'."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        raise RuntimeError("database connection lost during shutdown handshake")


@pytest.mark.parametrize("workers", [1, 4])
def test_loader_propagates_shutdown_worded_errors(workers):
    """A genuine dataset error whose message contains 'shutdown' must reach
    the consumer (not be swallowed by the pool-cancellation filter, which
    would leave the consumer blocked on q.get() forever)."""
    loader = Loader(_ShutdownMsgDataset(), batch_size=2, workers=workers)
    with pytest.raises(RuntimeError, match="handshake"):
        next(iter(loader))


def test_loader_early_exit_stops_producer(clevr_dataset_dir):
    """Breaking out of an epoch (max_steps) must stop the prefetch thread
    rather than leaving it blocked on a full queue."""
    import threading

    ds = ClevrInfinitePairs("train", clevr_dataset_dir, n_src=2, image_resolution=RES)
    before = threading.active_count()
    for _ in range(5):
        it = iter(Loader(ds, batch_size=1, prefetch=1))
        next(it)
        it.close()  # generator finally -> cancel + drain + join
    # pool.shutdown(wait=False) lets worker threads wind down
    # asynchronously — poll with a deadline instead of asserting instantly
    deadline = time.monotonic() + 10.0
    while threading.active_count() > before + 1 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1
