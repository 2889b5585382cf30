"""Cityscapes reader tests on a synthetic on-disk tree: labelId->trainId
reduction, train/val/testval modes, citys protocol constants."""

import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.cityscapes import NUM_CLASSES, CitySegmentation
from lseg_tpu.data.labels import get_labels


@pytest.fixture()
def citys_tree(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for city in ("aaa", "bbb"):
            img_dir = tmp_path / "cityscapes" / "leftImg8bit" / split / city
            ann_dir = tmp_path / "cityscapes" / "gtFine" / split / city
            img_dir.mkdir(parents=True)
            ann_dir.mkdir(parents=True)
            for i in range(2):
                arr = rng.randint(0, 255, (80, 100, 3), np.uint8)
                Image.fromarray(arr).save(
                    img_dir / f"{city}_{i:06d}_leftImg8bit.png")
                mask = rng.randint(0, 34, (80, 100)).astype(np.uint8)
                mask[0, 0] = 0    # unlabeled -> ignore
                mask[0, 1] = 7    # road -> 0
                mask[0, 2] = 33   # bicycle -> 18
                mask[0, 3] = 10   # rail track -> ignore
                Image.fromarray(mask).save(
                    ann_dir / f"{city}_{i:06d}_gtFine_labelIds.png")
    return str(tmp_path)


def test_testval_mode_mapping(citys_tree):
    ds = CitySegmentation(citys_tree, "val", mode="testval")
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (80, 100, 3)
    t = s["target"]
    assert t[0, 0] == -1
    assert t[0, 1] == 0
    assert t[0, 2] == 18
    assert t[0, 3] == -1
    assert t.max() <= 18 and t.min() >= -1


def test_train_mode(citys_tree):
    ds = CitySegmentation(citys_tree, "train", base_size=100, crop_size=64)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["target"].shape == (64, 64)
    assert s["target"].min() >= -1 and s["target"].max() <= 18


def test_val_mode(citys_tree):
    ds = CitySegmentation(citys_tree, "val", mode="val", crop_size=64)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)


def test_missing_root_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        CitySegmentation(str(tmp_path), "train")


def test_labels_and_protocol():
    labels = get_labels("citys")
    assert len(labels) == NUM_CLASSES == 19
    assert labels[0] == "road" and labels[-1] == "bicycle"
    # citys eval protocol preset (reference: test_lseg.py:308-312,
    # lseg_module.py:29-34)
    from lseg_tpu.engine.tta import CITYSCAPES_PROTOCOL

    assert CITYSCAPES_PROTOCOL.base_size == 2048
    assert CITYSCAPES_PROTOCOL.crop_size == 768
    assert CITYSCAPES_PROTOCOL.scales == (
        0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25)
