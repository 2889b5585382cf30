"""PASCAL VOC family readers on synthetic trees: pascal_voc (PNG masks,
255 boundary), pascal_aug (SBD .mat masks), pcontext (pre-converted
59-class PNGs)."""

import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.labels import get_labels
from lseg_tpu.data.voc import (
    PContextSegmentation,
    VOCAugSegmentation,
    VOCSegmentation,
)


@pytest.fixture()
def voc_tree(tmp_path):
    rng = np.random.RandomState(0)
    voc = tmp_path / "VOCdevkit" / "VOC2012"
    (voc / "ImageSets" / "Segmentation").mkdir(parents=True)
    (voc / "JPEGImages").mkdir()
    (voc / "SegmentationClass").mkdir()
    ids = ["2007_000001", "2007_000002"]
    (voc / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(ids) + "\n")
    for i in ids:
        Image.fromarray(
            rng.randint(0, 255, (70, 90, 3), np.uint8)
        ).save(voc / "JPEGImages" / f"{i}.jpg")
        mask = rng.randint(0, 21, (70, 90)).astype(np.uint8)
        mask[0, 0] = 255  # boundary
        Image.fromarray(mask).save(voc / "SegmentationClass" / f"{i}.png")
    return str(tmp_path)


def test_voc_reader(voc_tree):
    ds = VOCSegmentation(voc_tree, "val", mode="testval")
    assert len(ds) == 2 and ds.num_classes == 21
    s = ds[0]
    assert s["image"].shape == (70, 90, 3)
    assert s["target"][0, 0] == -1  # 255 -> ignore
    assert 0 <= s["target"].max() <= 20
    ds_t = VOCSegmentation(voc_tree, "val", mode="train",
                           base_size=80, crop_size=64)
    s = ds_t[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["target"].min() >= -1 and s["target"].max() <= 20


def test_voc_aug_reader(tmp_path):
    from scipy.io import savemat

    rng = np.random.RandomState(1)
    aug = tmp_path / "VOCaug" / "dataset"
    (aug / "img").mkdir(parents=True)
    (aug / "cls").mkdir()
    ids = ["2008_000003"]
    (aug / "train.txt").write_text("\n".join(ids) + "\n")
    for i in ids:
        Image.fromarray(
            rng.randint(0, 255, (60, 80, 3), np.uint8)
        ).save(aug / "img" / f"{i}.jpg")
        seg = rng.randint(0, 21, (60, 80)).astype(np.uint8)
        savemat(str(aug / "cls" / f"{i}.mat"),
                {"GTcls": {"Segmentation": seg}})
    ds = VOCAugSegmentation(str(tmp_path), "train", mode="testval")
    s = ds[0]
    assert s["image"].shape == (60, 80, 3)
    assert 0 <= s["target"].max() <= 20


def test_pcontext_reader(tmp_path):
    rng = np.random.RandomState(2)
    voc = tmp_path / "VOCdevkit" / "VOC2010"
    (voc / "ImageSets" / "SegmentationContext").mkdir(parents=True)
    (voc / "JPEGImages").mkdir()
    (voc / "SegmentationClassContext").mkdir()
    ids = ["2010_000001"]
    (voc / "ImageSets" / "SegmentationContext" / "val.txt").write_text(
        "\n".join(ids) + "\n")
    for i in ids:
        Image.fromarray(
            rng.randint(0, 255, (66, 88, 3), np.uint8)
        ).save(voc / "JPEGImages" / f"{i}.jpg")
        mask = rng.randint(0, 60, (66, 88)).astype(np.uint8)
        mask[0, 0] = 0   # background -> ignore
        mask[0, 1] = 1   # first class -> 0
        mask[0, 2] = 59  # last class -> 58
        Image.fromarray(mask).save(
            voc / "SegmentationClassContext" / f"{i}.png")
    ds = PContextSegmentation(str(tmp_path), "val", mode="testval")
    assert ds.num_classes == 59
    t = ds[0]["target"]
    assert t[0, 0] == -1 and t[0, 1] == 0 and t[0, 2] == 58
    assert t.max() <= 58


def test_missing_roots_raise(tmp_path):
    for cls in (VOCSegmentation, VOCAugSegmentation,
                PContextSegmentation):
        with pytest.raises(FileNotFoundError):
            cls(str(tmp_path), "train")


def test_label_lists():
    voc = get_labels("pascal_voc")
    assert len(voc) == 21 and voc[0] == "background"
    ctx = get_labels("pcontext")
    assert len(ctx) == 59 and ctx[0] == "aeroplane"
