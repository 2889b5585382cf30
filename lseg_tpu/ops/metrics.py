"""Segmentation metrics as jit-compiled device ops.

Replaces the reference's PyTorch-Encoding CUDA metric kernels
(`batch_pix_accuracy`, `batch_intersection_union`, `SegmentationMetric`,
reference: modules/lsegmentation_module.py:18,24,86-112 and
test_lseg.py:319) with weighted-bincount (segment-sum) confusion
accumulation on device — and reduces across the mesh with `psum`
instead of gathering predictions to host (SURVEY.md §5).

Semantics match encoding exactly:
- predictions are argmax+1, targets are shifted +1, pixels with shifted
  target == 0 (i.e. ignore/void, encoded as target < 0) are dropped;
- pixAcc  = correct / labeled
- IoU_k   = inter_k / union_k, mIoU = mean over ALL nclass classes
  (eps-guarded), as in encoding's `SegmentationMetric.get()`.

Few-shot variants (`episode_inter_union` + `AverageMeter`) reproduce
fewshot_data/common/evaluation.py:12-39 + logger.py:10-72: per-episode
area_inter/area_union on binary masks with query ignore regions folded
in, accumulated per class id; FB-IoU is the reference's ratio-of-sums
(logger.py:41-43), not a mean of per-class IoUs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def seg_update(
    logits: jnp.ndarray,   # (N, H, W, K)
    target: jnp.ndarray,   # (N, H, W) int, ignore encoded as < 0 (or ==255)
    nclass: int,
    ignore_index: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batch's metric contributions:
    (correct, labeled, inter[K], union[K]) — all int64-free fp32/int32
    device scalars/vectors, safe to psum across replicas."""
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)

    labeled = jnp.sum(valid)
    correct = jnp.sum((pred == tgt) & valid)

    # Per-class areas as weighted bincounts (segment_sum scatter-adds):
    # O(N*H*W) work and memory, vs the (N, H, W, K) fp32 one-hot pair
    # this replaces (~2x1.1 GB of intermediate at eval batch 8 / K=150
    # if XLA failed to fuse it). Invalid pixels carry weight 0.
    w = valid.reshape(-1).astype(jnp.float32)
    pf = pred.reshape(-1)
    tf = tgt.reshape(-1)
    area_pred = jax.ops.segment_sum(w, pf, num_segments=nclass)
    area_tgt = jax.ops.segment_sum(w, tf, num_segments=nclass)
    inter = jax.ops.segment_sum(w * (pf == tf), tf, num_segments=nclass)
    union = area_pred + area_tgt - inter
    return correct, labeled, inter, union


class SegmentationMetric:
    """Streaming pixAcc/mIoU accumulator (host-side state, device-side
    per-batch update), same protocol as encoding's SegmentationMetric."""

    def __init__(self, nclass: int, ignore_index: int = -1):
        self.nclass = nclass
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        import numpy as np

        self.total_correct = 0.0
        self.total_label = 0.0
        self.total_inter = np.zeros(self.nclass, dtype=np.float64)
        self.total_union = np.zeros(self.nclass, dtype=np.float64)

    def update(self, logits, target):
        c, l, i, u = jax.jit(
            seg_update, static_argnames=("nclass", "ignore_index")
        )(logits, target, nclass=self.nclass, ignore_index=self.ignore_index)
        import numpy as np

        self.total_correct += float(c)
        self.total_label += float(l)
        self.total_inter += np.asarray(i, dtype=np.float64)
        self.total_union += np.asarray(u, dtype=np.float64)

    def get(self) -> Tuple[float, float]:
        import numpy as np

        eps = np.spacing(1.0)
        pix_acc = self.total_correct / (eps + self.total_label)
        iou = self.total_inter / (eps + self.total_union)
        return float(pix_acc), float(np.mean(iou))

    def per_class_iou(self):
        import numpy as np

        eps = np.spacing(1.0)
        return self.total_inter / (eps + self.total_union)


# ---------------------------------------------------------------------------
# Few-shot episode metrics (fewshot_data/common/evaluation.py + logger.py)
# ---------------------------------------------------------------------------

def episode_inter_union(
    pred: jnp.ndarray,        # (N, H, W) binary {0,1} prediction
    target: jnp.ndarray,      # (N, H, W) binary {0,1} ground truth
    ignore_mask: jnp.ndarray,  # (N, H, W) bool — query ignore regions
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-episode (area_inter[N,2], area_union[N,2]) over {bg, fg},
    with ignored pixels folded into agreement (the reference sets both
    pred and gt to 255 there then histograms the non-255 bins —
    fewshot_data/common/evaluation.py:16-33)."""
    valid = ~ignore_mask
    pf = (pred == 1) & valid
    tf = (target == 1) & valid
    pb = (pred == 0) & valid
    tb = (target == 0) & valid
    inter_fg = jnp.sum(pf & tf, axis=(1, 2)).astype(jnp.float32)
    inter_bg = jnp.sum(pb & tb, axis=(1, 2)).astype(jnp.float32)
    area_p = jnp.stack(
        [jnp.sum(pb, axis=(1, 2)), jnp.sum(pf, axis=(1, 2))], axis=1
    ).astype(jnp.float32)
    area_t = jnp.stack(
        [jnp.sum(tb, axis=(1, 2)), jnp.sum(tf, axis=(1, 2))], axis=1
    ).astype(jnp.float32)
    inter = jnp.stack([inter_bg, inter_fg], axis=1)
    union = area_p + area_t - inter
    return inter, union


class AverageMeter:
    """Accumulates per-class fg/bg intersection & union buffers and
    computes mIoU (mean over classes of fg IoU) and FB-IoU
    (fewshot_data/common/logger.py:10-72)."""

    def __init__(self, class_ids):
        import numpy as np

        self.class_ids = list(class_ids)
        n = int(max(self.class_ids)) + 1 if self.class_ids else 1
        self.inter = np.zeros((2, n), dtype=np.float64)
        self.union = np.zeros((2, n), dtype=np.float64)
        self.loss_sum = 0.0
        self.count = 0

    def update(self, inter, union, class_id, loss=None):
        import numpy as np

        inter = np.asarray(inter, dtype=np.float64)  # (N, 2)
        union = np.asarray(union, dtype=np.float64)
        cid = np.asarray(class_id, dtype=np.int64).reshape(-1)
        for j, c in enumerate(cid):
            self.inter[:, c] += inter[j]
            self.union[:, c] += union[j]
        if loss is not None:
            self.loss_sum += float(loss)
            self.count += 1

    def compute_iou(self):
        import numpy as np

        sel = np.asarray(self.class_ids, dtype=np.int64)
        iou = self.inter[:, sel] / np.maximum(self.union[:, sel], 1.0)
        miou = float(np.mean(iou[1]) * 100)
        # FB-IoU is the RATIO OF SUMS per {bg, fg} row — sum inter and
        # union over the classes of interest first, divide, then mean
        # the two row ratios (fewshot_data/common/logger.py:41-43) —
        # NOT the mean of per-class IoUs (a mathematically different
        # quantity; mean-of-ratios != ratio-of-means).
        fb = (self.inter[:, sel].sum(axis=1)
              / np.maximum(self.union[:, sel].sum(axis=1), 1e-9))
        fb_iou = float(np.mean(fb) * 100)
        return miou, fb_iou
