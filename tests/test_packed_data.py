"""Packed-shard data path: native C++ batch assembly must be bit-identical
to the per-PNG CodebookDataset pipeline (reference data/base.py:30-188)."""
import os

import numpy as np
import pytest
from PIL import Image

from sgam_neurips22_tpu.mapping.mesh import native_available
from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
from sgam_neurips22_tpu.training.data.datamodule import DataModule, Loader
from sgam_neurips22_tpu.training.data.packed import (
    PackedCodebookDataset,
    shard_path,
    write_shard,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)

RES = (32, 32)


@pytest.fixture()
def packed_dataset_dir(tmp_path):
    """PNG+npy codebook dataset (stored at 48x48 so LANCZOS resize is
    exercised) plus its packed shard."""
    rng = np.random.default_rng(7)
    ddir = tmp_path / "data"
    scene = ddir / "train" / "scene"
    os.makedirs(scene)
    np.save(ddir / "K.npy", np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]]))
    paths = []
    for i in range(6):
        img = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(img).save(scene / f"im_{i:05d}.png")
        np.save(scene / f"dm_{i:05d}.npy", rng.uniform(8, 14, (48, 48)).astype(np.float32))
        paths.append(str(scene / f"im_{i:05d}.png"))
    (ddir / "train.txt").write_text("\n".join(paths))
    (ddir / "val.txt").write_text("\n".join(paths[:4]))

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from pack_dataset import pack_split

    for split in ("train", "val"):
        ds = CodebookDataset(split, str(ddir), "clevr-infinite", RES)
        pack_split(ds, shard_path(str(ddir), split, RES), use_depth=True)
    return str(ddir)


def test_packed_examples_bit_identical(packed_dataset_dir):
    png = CodebookDataset("train", packed_dataset_dir, "clevr-infinite", RES)
    packed = PackedCodebookDataset(shard_path(packed_dataset_dir, "train", RES))
    assert len(png) == len(packed)
    assert (packed.height, packed.width, packed.channels) == (*RES, 4)
    for i in range(len(png)):
        np.testing.assert_array_equal(packed[i]["image"], png[i]["image"])
    packed.close()


def test_assemble_batch_thread_invariant(packed_dataset_dir):
    packed = PackedCodebookDataset(shard_path(packed_dataset_dir, "train", RES))
    idxs = [3, 0, 5, 1]
    one = PackedCodebookDataset(
        shard_path(packed_dataset_dir, "train", RES), threads=1
    )
    np.testing.assert_array_equal(
        packed.assemble_batch(idxs)["image"], one.assemble_batch(idxs)["image"]
    )
    with pytest.raises(IndexError):
        packed.assemble_batch([99])
    packed.close()
    one.close()


def test_loader_uses_packed_fast_path(packed_dataset_dir):
    png = CodebookDataset("train", packed_dataset_dir, "clevr-infinite", RES)
    packed = PackedCodebookDataset(shard_path(packed_dataset_dir, "train", RES))
    b_png = list(Loader(png, batch_size=2, shuffle=True, seed=11))
    b_pkd = list(Loader(packed, batch_size=2, shuffle=True, seed=11))
    assert len(b_png) == len(b_pkd) == 3
    for a, b in zip(b_png, b_pkd):
        np.testing.assert_array_equal(a["image"], b["image"])
    packed.close()


def test_datamodule_auto_pickup_and_fallback(packed_dataset_dir):
    dm = DataModule(
        batch_size=2, dataset="clevr-infinite", phase="codebook",
        dataset_dir=packed_dataset_dir, image_resolution=RES,
    )
    assert isinstance(dm.train_ds, PackedCodebookDataset)
    assert isinstance(dm.val_ds, PackedCodebookDataset)

    dm_png = DataModule(
        batch_size=2, dataset="clevr-infinite", phase="codebook",
        dataset_dir=packed_dataset_dir, image_resolution=RES, packed=False,
    )
    assert isinstance(dm_png.train_ds, CodebookDataset)

    with pytest.raises(FileNotFoundError):
        DataModule(
            batch_size=2, dataset="clevr-infinite", phase="codebook",
            dataset_dir=packed_dataset_dir, image_resolution=(64, 64), packed=True,
        )


def test_corrupt_shard_rejected(tmp_path):
    bad = tmp_path / "bad.sgpk"
    bad.write_bytes(b"not a shard at all")
    with pytest.raises(OSError):
        PackedCodebookDataset(str(bad))
    # truncated: valid header claiming more records than the file holds
    rgb = [np.zeros((4, 4, 3), np.uint8)] * 2
    disp = [np.zeros((4, 4), np.float32)] * 2
    ok = tmp_path / "ok.sgpk"
    write_shard(str(ok), rgb, disp)
    data = ok.read_bytes()
    trunc = tmp_path / "trunc.sgpk"
    trunc.write_bytes(data[:-8])
    with pytest.raises(OSError):
        PackedCodebookDataset(str(trunc))
    # the intact shard loads
    ds = PackedCodebookDataset(str(ok))
    assert len(ds) == 2
    ds.close()


@pytest.fixture()
def clevr_pair_dir(tmp_path):
    """Tiny CLEVR-style pair dataset (transforms.json pose graph)."""
    import json

    rng = np.random.default_rng(3)
    k = np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]])
    np.save(tmp_path / "K.npy", k)
    for split in ("train", "val"):
        scene = tmp_path / split / "scene_0001"
        os.makedirs(scene)
        frames = []
        for i in range(6):
            c2w = np.eye(4)
            c2w[:3, 3] = [i * 0.5, 0, 0]
            frames.append(
                {"transform_matrix": c2w.tolist(), "file_path": f"im_{i:05d}.png"}
            )
            img = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(img).save(scene / f"im_{i:05d}.png")
            np.save(scene / f"dm_{i:05d}.npy", rng.uniform(8, 14, (48, 48)).astype(np.float32))
        with open(scene / "transforms.json", "w") as f:
            json.dump({"frames": frames}, f)
    return str(tmp_path)


def test_pair_frame_store_bit_identical(clevr_pair_dir):
    """Pair examples built through the packed frame store must match the
    per-PNG pipeline bit-for-bit (val split: deterministic source picks)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from pack_dataset import pack_pair_frames

    from sgam_neurips22_tpu.training.data.packed import (
        PackedFrameStore,
        frame_store_path,
    )
    from sgam_neurips22_tpu.training.data.pair_dataset import ClevrInfinitePairs

    png_ds = ClevrInfinitePairs("val", clevr_pair_dir, n_src=2, image_resolution=RES)
    store_file = frame_store_path(clevr_pair_dir, "val", RES)
    pack_pair_frames(png_ds, store_file)

    store = PackedFrameStore(store_file)
    packed_ds = ClevrInfinitePairs(
        "val", clevr_pair_dir, n_src=2, image_resolution=RES, frame_store=store
    )
    assert len(png_ds) == len(packed_ds)
    for i in range(len(png_ds)):
        a, b = png_ds[i], packed_ds[i]
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    store.close()


def test_frame_store_rejects_codebook_shard(packed_dataset_dir):
    from sgam_neurips22_tpu.training.data.packed import (
        PackedFrameStore,
        shard_path,
    )

    with pytest.raises(OSError, match="frame store"):
        PackedFrameStore(shard_path(packed_dataset_dir, "train", RES))


def test_datamodule_pair_auto_pickup(clevr_pair_dir):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from pack_dataset import pack_pair_frames

    from sgam_neurips22_tpu.training.data.packed import frame_store_path
    from sgam_neurips22_tpu.training.data.pair_dataset import ClevrInfinitePairs

    for split in ("train", "val"):
        ds = ClevrInfinitePairs(split, clevr_pair_dir, image_resolution=RES)
        pack_pair_frames(ds, frame_store_path(clevr_pair_dir, split, RES))

    dm = DataModule(
        batch_size=2, dataset="clevr-infinite", phase="conditional_generation",
        dataset_dir=clevr_pair_dir, image_resolution=RES, n_src=2,
    )
    assert dm.train_ds.frame_store is not None
    assert dm.val_ds.frame_store is not None
    batch = next(iter(dm.train_loader()))
    assert batch["src_imgs"].shape == (2, 2, *RES, 3)

    dm_png = DataModule(
        batch_size=2, dataset="clevr-infinite", phase="conditional_generation",
        dataset_dir=clevr_pair_dir, image_resolution=RES, n_src=2, packed=False,
    )
    assert dm_png.train_ds.frame_store is None
