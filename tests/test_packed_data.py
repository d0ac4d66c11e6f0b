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
