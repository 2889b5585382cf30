"""Episodic (zero-shot / few-shot) inference — the LSegNetZS path.

The reference's ZS forward takes a per-image class id, embeds the
['others', <class>] text pair, and computes binary per-pixel logits
with a Python loop over the batch (reference:
modules/models/lseg_net_zs.py:169-214). Here the pair embeddings are
pre-gathered into a (B, 2, C) tensor and the correlation is one batched
einsum — no loop, no per-call tokenization.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.ops.correlation import l2_normalize
from lseg_tpu.ops.metrics import AverageMeter, episode_inter_union
from lseg_tpu.ops.resize import upsample2x


def make_episodic_predictor(model, variables) -> Callable:
    """(images (B,H,W,3), txt_pairs (B,K,C)) -> (B,H,W) int32 argmax
    over the per-image label set (K=2 for the binary episode head).
    Host-level callable; params are jit ARGUMENTS (closure-captured
    weights would inline as constants — engine/serve.py docstring)."""
    import functools

    scale = model.cfg.logit_scale

    @jax.jit
    def predict(variables, images, txt_pairs):
        emb = model.apply(variables, images, None)
        img = l2_normalize(emb.astype(jnp.float32))
        txt = l2_normalize(txt_pairs.astype(jnp.float32))
        logits = scale * jnp.einsum(
            "nhwc,nkc->nhwk", img, txt,
            preferred_element_type=jnp.float32,
        )
        up = upsample2x(logits, align_corners=True)
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    return functools.partial(predict, variables)


class EpisodicEvaluator:
    """The 1000-episode protocol (reference: test_lseg_zs.py:290-316):
    per-episode binary prediction -> inter/union with ignore folding ->
    AverageMeter -> mIoU / FB-IoU."""

    def __init__(self, predict_fn, class_ids: Sequence[int],
                 visualizer=None):
        self.predict = predict_fn
        self.meter = AverageMeter(class_ids)
        self._iu = jax.jit(episode_inter_union)
        # optional lseg_tpu.utils.fewshot_vis.EpisodeVisualizer: saves
        # support/pred/gt composites per episode (reference
        # fewshot_data/common/vis.py Visualizer)
        self.visualizer = visualizer

    def run(self, dataset, pair_features_fn, batch_size: int = 8,
            log=print, log_every: int = 50):
        """pair_features_fn(class_id) -> (2, C) ['others', label]
        embeddings (cached per class by TextFeatureCache)."""
        n = len(dataset)
        for start in range(0, n, batch_size):
            idxs = range(start, min(start + batch_size, n))
            eps = [dataset[i] for i in idxs]
            imgs = jnp.asarray(np.stack([e["query_img"] for e in eps]))
            pairs = jnp.asarray(np.stack([
                np.asarray(pair_features_fn(int(e["class_id"])))
                for e in eps
            ]))
            pred = self.predict(imgs, pairs)
            tgt = jnp.asarray(np.stack([e["query_mask"] for e in eps]))
            ign = jnp.asarray(np.stack([e["query_ignore"] for e in eps]))
            inter, union = self._iu(pred, tgt, ign)
            self.meter.update(
                np.asarray(inter), np.asarray(union),
                np.asarray([e["class_id"] for e in eps]),
            )
            if self.visualizer is not None:
                it, un = np.asarray(inter), np.asarray(union)
                fg_iou = it[:, 1] / np.maximum(un[:, 1], 1e-7)
                self.visualizer.batch(
                    {k: np.stack([e[k] for e in eps])
                     for k in ("support_imgs", "support_masks",
                               "query_img", "query_mask")},
                    np.asarray(pred),
                    [int(e["class_id"]) for e in eps],
                    start // batch_size, ious=fg_iou,
                )
            if (start // batch_size) % log_every == 0:
                miou, fb = self.meter.compute_iou()
                log(f"[{start + len(eps)}/{n}] mIoU {miou:.2f} "
                    f"FB-IoU {fb:.2f}")
        return self.meter.compute_iou()
