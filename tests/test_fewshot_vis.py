"""Episode visualizer: composite layout, mask tinting, file naming
(reference: fewshot_data/common/vis.py:11-108)."""

import numpy as np
from PIL import Image

from lseg_tpu.utils.fewshot_vis import (
    EpisodeVisualizer,
    apply_mask,
    merge_horizontal,
    unnormalize,
)


def test_apply_mask_tints_only_masked_pixels():
    img = np.full((4, 4, 3), 200, np.uint8)
    mask = np.zeros((4, 4), np.int32)
    mask[0, 0] = 1
    out = apply_mask(img, mask, (255, 50, 50), alpha=0.5)
    assert tuple(out[0, 0]) == (227, 125, 125)  # 0.5*200 + 0.5*color
    assert tuple(out[1, 1]) == (200, 200, 200)


def test_unnormalize_roundtrip():
    rgb = np.asarray([[[0.25, 0.5, 0.75]]], np.float32)
    norm = (rgb - 0.5) / 0.5
    out = unnormalize(norm, (0.5,) * 3, (0.5,) * 3)
    # truncation, matching torchvision ToPILImage's mul(255).byte()
    np.testing.assert_array_equal(out[0, 0], [63, 127, 191])


def test_merge_horizontal_canvas():
    a = np.zeros((4, 3, 3), np.uint8)
    b = np.zeros((6, 5, 3), np.uint8)
    canvas = merge_horizontal([a, b])
    assert canvas.size == (8, 6)  # (sum W, max H)


def test_episode_visualizer_writes_named_jpegs(tmp_path):
    vis = EpisodeVisualizer(str(tmp_path))
    rng = np.random.RandomState(0)
    batch = {
        "support_imgs": rng.randn(2, 2, 8, 8, 3).astype(np.float32),
        "support_masks": rng.randint(0, 2, (2, 2, 8, 8)),
        "query_img": rng.randn(2, 8, 8, 3).astype(np.float32),
        "query_mask": rng.randint(0, 2, (2, 8, 8)),
    }
    preds = rng.randint(0, 2, (2, 8, 8))
    paths = vis.batch(batch, preds, [3, 7], batch_idx=5,
                      ious=[0.25, 0.8])
    assert len(paths) == 2
    assert paths[0].endswith("5_0_class-3_iou-0.25.jpg")
    assert paths[1].endswith("5_1_class-7_iou-0.80.jpg")
    im = Image.open(paths[0])
    # 2 supports + pred + gt panels, each 8 px wide
    assert im.size == (32, 8)
