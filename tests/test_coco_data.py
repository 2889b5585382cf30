"""MS-COCO segmentation reader: RLE decoding (uncompressed + the
compressed LEB/delta string format), first-wins class painting, and the
end-to-end reader on a synthetic COCO tree."""

import json

import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.coco import (
    CAT_LIST,
    COCOSegmentation,
    decode_rle,
)


def _encode_rle_string(runs):
    """pycocotools rleToString: base-32 chars offset 48, 5 bits + more
    bit, runs delta-coded against runs[i-2] for i > 2."""
    out = []
    for i, x in enumerate(runs):
        if i > 2:
            x -= runs[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and not (
                x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_decode_uncompressed_rle():
    # 3x2 mask, column-major: col0 = [0,1,1], col1 = [1,0,0]
    rle = {"size": [3, 2], "counts": [1, 3, 2]}
    m = decode_rle(rle)
    np.testing.assert_array_equal(
        m, [[0, 1], [1, 0], [1, 0]])


def test_decode_compressed_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(13, 7) > 0.5).astype(np.uint8)
    flat = mask.T.reshape(-1)  # column-major
    runs, val, count = [], 0, 0
    for v in flat:
        if v == val:
            count += 1
        else:
            runs.append(count)
            val, count = v, 1
    runs.append(count)
    rle = {"size": [13, 7], "counts": _encode_rle_string(runs)}
    np.testing.assert_array_equal(decode_rle(rle), mask)


@pytest.fixture()
def coco_tree(tmp_path):
    rng = np.random.RandomState(0)
    (tmp_path / "coco" / "annotations").mkdir(parents=True)
    (tmp_path / "coco" / "val2017").mkdir()
    h, w = 40, 50
    for fname in ("a.jpg", "b.jpg"):
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(tmp_path / "coco" / "val2017" / fname)

    def full_rle(v0, n1):
        return {"size": [h, w], "counts": [v0, n1, h * w - v0 - n1]}

    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": h, "width": w},
            {"id": 2, "file_name": "b.jpg", "height": h, "width": w},
        ],
        "annotations": [
            # image 1: cat id 5 (VOC idx 1) covering 1200 px,
            # then cat id 2 (VOC idx 2) overlapping -> first wins
            {"image_id": 1, "category_id": 5,
             "segmentation": full_rle(0, 1200)},
            {"image_id": 1, "category_id": 2,
             "segmentation": full_rle(600, 1200)},
            # image 1: an unmapped category -> skipped
            {"image_id": 1, "category_id": 99,
             "segmentation": full_rle(0, 50)},
            # image 2: polygon annotation, tiny (-> dropped by
            # min_pixels)
            {"image_id": 2, "category_id": 16,
             "segmentation": [[1.0, 1.0, 8.0, 1.0, 8.0, 8.0, 1.0, 8.0]]},
        ],
        "categories": [],
    }
    with open(tmp_path / "coco" / "annotations"
              / "instances_val2017.json", "w") as f:
        json.dump(data, f)
    return str(tmp_path)


def test_coco_reader(coco_tree):
    ds = COCOSegmentation(coco_tree, "val", mode="testval")
    # image 2 has <1000 labeled pixels -> dropped
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (40, 50, 3)
    t = s["target"]
    assert t.shape == (40, 50)
    # first 1200 column-major px painted class 1; the overlapping
    # class-2 ann only paints where still background
    assert (t == 1).sum() == 1200
    assert (t == 2).sum() == 600
    assert t.max() <= 20 and t.min() >= 0


def test_coco_polygon_and_min_pixels(coco_tree):
    ds = COCOSegmentation(coco_tree, "val", mode="testval",
                          min_pixels=10)
    assert len(ds) == 2
    t = ds[1]["target"]
    assert (t == CAT_LIST.index(16)).sum() >= 49  # ~8x8 square


def test_missing_annotations_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        COCOSegmentation(str(tmp_path), "val")


def test_min_pixels_filter_is_cached(coco_tree):
    import glob

    ds = COCOSegmentation(coco_tree, "val", mode="testval")
    sidecars = glob.glob(
        coco_tree + "/coco/annotations/*.lseg_ids_min1000.npy")
    assert len(sidecars) == 1
    # second construction must load the cached id list (and per-cfg
    # caches must not collide: a different min_pixels re-filters)
    ds2 = COCOSegmentation(coco_tree, "val", mode="testval")
    assert [it[0] for it in ds2.items] == [it[0] for it in ds.items]
    ds3 = COCOSegmentation(coco_tree, "val", mode="testval",
                           min_pixels=10)
    assert len(ds3) == 2 and len(ds2) == 1
    # a truncated/corrupt sidecar must be recomputed, not crash
    with open(sidecars[0], "wb") as f:
        f.write(b"\x93NUMPY garbage")
    ds4 = COCOSegmentation(coco_tree, "val", mode="testval")
    assert len(ds4) == 1
