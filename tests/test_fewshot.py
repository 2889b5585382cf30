"""Few-shot dataset + episodic evaluator tests on synthetic on-disk
fixtures (tiny VOC/FSS-style trees)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.fewshot import DatasetFSS, DatasetPASCAL
from lseg_tpu.engine.episodic import (
    EpisodicEvaluator,
    make_episodic_predictor,
)
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.ops.metrics import AverageMeter, episode_inter_union
from lseg_tpu.testing import tiny_vit_config


def _make_voc(tmp_path, names_per_class):
    img_dir = tmp_path / "VOC2012" / "JPEGImages"
    ann_dir = tmp_path / "VOC2012" / "SegmentationClassAug"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    splits = tmp_path / "splits" / "pascal" / "val"
    splits.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for cid, names in names_per_class.items():
        for name in names:
            img = rng.randint(0, 255, (50, 60, 3), np.uint8)
            Image.fromarray(img).save(img_dir / f"{name}.jpg")
            mask = np.zeros((50, 60), np.uint8)
            mask[10:30, 10:40] = cid + 1  # 1-based class label
            mask[0:3] = 255               # boundary/ignore rim
            Image.fromarray(mask).save(ann_dir / f"{name}.png")
            lines.append(f"{name}__{cid + 1}")
    (splits / "fold0.txt").write_text("\n".join(lines) + "\n")
    return str(tmp_path), str(tmp_path / "splits")


def test_pascal_dataset(tmp_path):
    datapath, splits = _make_voc(
        tmp_path, {0: ["a0", "a1"], 1: ["b0", "b1"], 2: ["c0"]}
    )
    ds = DatasetPASCAL(datapath, fold=0, split="test", shot=1,
                       splits_dir=splits, img_size=64)
    assert len(ds) == 1000  # protocol clamp (pascal.py:29-33)
    ep = ds[0]
    assert ep["query_img"].shape == (64, 64, 3)
    assert ep["query_mask"].shape == (64, 64)
    assert set(np.unique(ep["query_mask"])) <= {0, 1}
    assert ep["query_ignore"].any()       # 255 rim present
    assert ep["support_imgs"].shape == (1, 64, 64, 3)
    # support never equals query
    assert ep["support_masks"].shape == (1, 64, 64)
    # deterministic per (seed, idx)
    ep2 = ds[0]
    np.testing.assert_array_equal(ep["query_img"], ep2["query_img"])
    # idx wraps past the metadata length
    ep_wrap = ds[len(ds.img_metadata)]
    np.testing.assert_array_equal(
        ds[0]["query_mask"], ep_wrap["query_mask"]
    )


def test_fss_dataset(tmp_path):
    base = tmp_path / "FSS-1000"
    cats = ["ant", "bee"]
    rng = np.random.RandomState(0)
    for cat in cats:
        d = base / cat
        d.mkdir(parents=True)
        for i in range(1, 4):
            Image.fromarray(
                rng.randint(0, 255, (40, 40, 3), np.uint8)
            ).save(d / f"{i}.jpg")
            m = np.zeros((40, 40), np.uint8)
            m[5:20, 5:20] = 255
            Image.fromarray(m).save(d / f"{i}.png")
    splits = tmp_path / "splits" / "fss"
    splits.mkdir(parents=True)
    (splits / "test.txt").write_text("ant\nbee\n")

    ds = DatasetFSS(str(tmp_path), fold=0, split="test", shot=1,
                    splits_dir=str(tmp_path / "splits"), img_size=32)
    # 1-shot test: queries are images 2..N (1.jpg reserved as support)
    assert len(ds) == 4
    ep = ds[0]
    assert int(ep["class_id"]) == 760  # test offset (fss.py:96-98)
    assert ep["query_mask"].max() == 1
    assert ep["support_imgs"].shape == (1, 32, 32, 3)


def test_episode_inter_union_ignore_folding():
    pred = jnp.asarray(np.array([[[1, 1], [0, 0]]], np.int32))
    tgt = jnp.asarray(np.array([[[1, 0], [0, 0]]], np.int32))
    ign = jnp.asarray(np.array([[[False, True], [False, False]]]))
    inter, union = episode_inter_union(pred, tgt, ign)
    # ignored pixel (0,1) dropped: fg inter=1 union=1; bg inter=2 union=2
    np.testing.assert_array_equal(np.asarray(inter), [[2, 1]])
    np.testing.assert_array_equal(np.asarray(union), [[2, 1]])


def _reference_compute_iou(inter_buf, union_buf, class_ids):
    """Literal NumPy transcription of the reference's
    AverageMeter.compute_iou (fewshot_data/common/logger.py:37-45):
    per-class IoU with union clamped to >=1, mIoU = mean of fg-row
    IoUs over the classes of interest; FB-IoU = RATIO OF SUMS per
    {bg, fg} row over the classes of interest, then mean of the two
    row ratios."""
    sel = np.asarray(class_ids, np.int64)
    iou = inter_buf / np.maximum(union_buf, 1.0)
    miou = iou[1, sel].mean() * 100
    fb_iou = (inter_buf[:, sel].sum(axis=1)
              / union_buf[:, sel].sum(axis=1)).mean() * 100
    return miou, fb_iou


def test_average_meter_miou():
    m = AverageMeter([3, 7])
    m.update(np.array([[1.0, 1.0]]), np.array([[2.0, 2.0]]), [3])
    m.update(np.array([[3.0, 1.0]]), np.array([[3.0, 4.0]]), [7])
    miou, fb = m.compute_iou()
    # fg IoUs: 0.5 (class 3), 0.25 (class 7) -> 37.5
    assert abs(miou - 37.5) < 1e-6
    # FB-IoU is the ratio of SUMS per row (logger.py:41-43):
    # bg (1+3)/(2+3)=0.8, fg (1+1)/(2+4)=1/3 -> mean 56.666...
    assert abs(fb - 100 * (0.8 + 1 / 3) / 2) < 1e-6
    # and both must agree with the literal reference transcription
    ref_miou, ref_fb = _reference_compute_iou(m.inter, m.union, [3, 7])
    assert abs(miou - ref_miou) < 1e-9
    assert abs(fb - ref_fb) < 1e-9


def test_average_meter_fb_iou_randomized():
    """Property check vs the reference oracle on random buffers."""
    rng = np.random.RandomState(7)
    class_ids = [1, 4, 5, 9]
    m = AverageMeter(class_ids)
    for _ in range(20):
        c = rng.choice(class_ids, size=3)
        inter = rng.randint(0, 50, (3, 2)).astype(np.float64)
        union = inter + rng.randint(0, 50, (3, 2))
        m.update(inter, union, c)
    miou, fb = m.compute_iou()
    ref_miou, ref_fb = _reference_compute_iou(m.inter, m.union,
                                              class_ids)
    assert abs(miou - ref_miou) < 1e-9
    assert abs(fb - ref_fb) < 1e-9


def test_episodic_evaluator_runs(tmp_path):
    datapath, splits = _make_voc(
        tmp_path, {0: ["a0", "a1"], 1: ["b0", "b1"]}
    )
    full = DatasetPASCAL(datapath, fold=0, split="test", shot=0,
                         splits_dir=splits, img_size=64)

    class _Slice:  # 4-episode view to keep the test fast
        class_ids = full.class_ids

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return full[i]

    ds = _Slice()

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((2, cfg.out_c)),
    )
    predictor = make_episodic_predictor(model, variables)
    pairs = {
        c: jax.random.normal(jax.random.PRNGKey(c), (2, cfg.out_c))
        for c in range(5)
    }
    ev = EpisodicEvaluator(predictor, ds.class_ids)
    miou, fb = ev.run(ds, lambda c: pairs[c], batch_size=2,
                      log=lambda *_: None)
    assert 0.0 <= miou <= 100.0
    assert 0.0 <= fb <= 100.0


def test_coco_dataset(tmp_path):
    """COCO-20i layout: COCO2014/{val2014,annotations/val2014}, names
    carry the split subdir, episodes sampled per (seed, idx)."""
    import pickle

    from lseg_tpu.data.fewshot import DatasetCOCO

    rng = np.random.RandomState(0)
    base = tmp_path / "COCO2014"
    (base / "val2014").mkdir(parents=True)
    (base / "annotations" / "val2014").mkdir(parents=True)
    classwise = {}
    fold = 0
    class_ids = [fold + 4 * v for v in range(3)]  # 0, 4, 8
    for cid in class_ids:
        names = []
        for j in range(2):
            name = f"val2014/COCO_val2014_c{cid}_{j}.jpg"
            img = rng.randint(0, 255, (40, 50, 3), np.uint8)
            Image.fromarray(img).save(base / name)
            m = np.zeros((40, 50), np.uint8)
            m[5:20, 5:30] = cid + 1
            Image.fromarray(m).save(
                base / "annotations" / (name[:-4] + ".png")
            )
            names.append(name)
        classwise[cid] = names
    splits = tmp_path / "splits" / "coco" / "val"
    splits.mkdir(parents=True)
    with open(splits / "fold0.pkl", "wb") as f:
        pickle.dump(classwise, f)

    ds = DatasetCOCO(str(tmp_path), fold=0, split="test", shot=1,
                     splits_dir=str(tmp_path / "splits"), img_size=32)
    ds.class_ids = class_ids  # tiny fixture has 3 of the 20 classes
    assert len(ds) == 1000
    ep = ds[0]
    assert ep["query_img"].shape == (32, 32, 3)
    assert set(np.unique(ep["query_mask"])) <= {0, 1}
    assert int(ep["class_id"]) in class_ids
    assert ep["support_imgs"].shape == (1, 32, 32, 3)
    # seed-stable
    np.testing.assert_array_equal(ds[3]["query_mask"],
                                  ds[3]["query_mask"])
