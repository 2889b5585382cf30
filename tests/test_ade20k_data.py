"""ADE20K reader tests on a synthetic on-disk tree: void->ignore mask
shift, train/val/testval modes, transform invariants."""

import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.ade20k import ADE20KSegmentation


@pytest.fixture()
def ade_tree(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("training", "validation"):
        img_dir = tmp_path / "ADEChallengeData2016" / "images" / split
        ann_dir = tmp_path / "ADEChallengeData2016" / "annotations" / split
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 255, (70, 90, 3), np.uint8)
            Image.fromarray(arr).save(img_dir / f"ADE_{split}_{i}.jpg")
            mask = rng.randint(0, 151, (70, 90)).astype(np.uint8)
            mask[0, 0] = 0  # guaranteed void pixel
            Image.fromarray(mask).save(ann_dir / f"ADE_{split}_{i}.png")
    return str(tmp_path)


def test_testval_mode(ade_tree):
    ds = ADE20KSegmentation(ade_tree, "val", mode="testval")
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (70, 90, 3)
    assert s["image"].dtype == np.float32
    # normalize(0.5, 0.5) range
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
    # void (0) -> ignore (-1); classes 1..150 -> 0..149
    assert s["target"][0, 0] == -1
    assert s["target"].max() <= 149
    assert s["target"].min() >= -1


def test_val_mode_center_crop(ade_tree):
    ds = ADE20KSegmentation(ade_tree, "val", mode="val", crop_size=64)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["target"].shape == (64, 64)


def test_train_mode_augmentation(ade_tree):
    ds = ADE20KSegmentation(ade_tree, "train", base_size=80, crop_size=64)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["target"].shape == (64, 64)
    assert s["target"].min() >= -1
    assert s["target"].max() <= 149


def test_missing_root_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ADE20KSegmentation(str(tmp_path), "train")


def test_train_aug_deterministic_per_epoch(ade_tree):
    ds1 = ADE20KSegmentation(ade_tree, "train", base_size=80,
                             crop_size=64, seed=7)
    ds2 = ADE20KSegmentation(ade_tree, "train", base_size=80,
                             crop_size=64, seed=7)
    np.testing.assert_array_equal(ds1[0]["image"], ds2[0]["image"])
    # different epoch -> different augmentation
    ds2.set_epoch(1)
    assert not np.array_equal(ds1[0]["image"], ds2[0]["image"])
