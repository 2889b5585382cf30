"""Episodic (zero-/few-shot) training — the reference's
LSegmentationModuleZS/LSegModuleZS path (reference:
modules/lsegmentation_module_zs.py:86-145,338-343): per-episode binary
['others', <class>] cross-entropy on the query image, optional frozen
backbone, support images usable as extra supervision in finetune mode.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from lseg_tpu.ops.correlation import l2_normalize
from lseg_tpu.ops.losses import cross_entropy
from lseg_tpu.ops.metrics import episode_inter_union
from lseg_tpu.ops.resize import upsample2x


def episodic_logits(apply_fn, variables, images, txt_pairs, scale,
                    train=False):
    """(B,H,W,3) images + (B,2,C) pair embeddings -> (B,H,W,2) logits,
    batched (no per-image loop, reference lseg_net_zs.py:198-210)."""
    out = apply_fn(variables, images, None, train=train)
    if train:
        out, mut = out
    emb = l2_normalize(out.astype(jnp.float32))
    txt = l2_normalize(txt_pairs.astype(jnp.float32))
    logits = scale * jnp.einsum(
        "nhwc,nkc->nhwk", emb, txt, preferred_element_type=jnp.float32
    )
    logits = upsample2x(logits, align_corners=True)
    return (logits, mut) if train else logits


def make_episodic_train_step(logit_scale: float,
                             ignore_index: int = 255) -> Callable:
    """train_step(state, batch, txt_pairs) -> (state, metrics).

    batch: {'query_img': (B,H,W,3), 'query_mask': (B,H,W) {0,1},
    'query_ignore': (B,H,W) bool}; txt_pairs: (B,2,C). Binary CE with
    the ignore region folded in (the reference feeds mask==255 as
    ignore_index to CE, lsegmentation_module_zs.py:338-343)."""

    def loss_fn(params, batch_stats, apply_fn, batch, txt_pairs):
        def run(v, img, txt, train):
            return apply_fn(v, img, txt, train=train,
                            mutable=["batch_stats"] if train else False)

        (emb, mut) = run(
            {"params": params, "batch_stats": batch_stats},
            batch["query_img"], None, True,
        )
        e = l2_normalize(emb.astype(jnp.float32))
        t = l2_normalize(txt_pairs.astype(jnp.float32))
        logits = logit_scale * jnp.einsum(
            "nhwc,nkc->nhwk", e, t, preferred_element_type=jnp.float32
        )
        logits = upsample2x(logits, align_corners=True)
        tgt = jnp.where(
            batch["query_ignore"], ignore_index,
            batch["query_mask"],
        ).astype(jnp.int32)
        loss = cross_entropy(logits, tgt, ignore_index=ignore_index)
        return loss, (logits, mut["batch_stats"])

    def train_step(state, batch: Dict, txt_pairs):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (logits, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn,
            batch, txt_pairs,
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        pred = jnp.argmax(logits, axis=-1)
        inter, union = episode_inter_union(
            pred, batch["query_mask"], batch["query_ignore"]
        )
        return new_state, {"loss": loss, "inter": inter, "union": union}

    return train_step
