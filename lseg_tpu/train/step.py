"""jit/pjit-staged train & eval steps.

The reference's per-rank hot loop (training_step,
modules/lsegmentation_module.py:66-81) becomes one pure function: under
`jax.jit` with batch-sharded inputs the gradient all-reduce over the
`data` mesh axis is inserted by XLA (SPMD), replacing PyTorch-Lightning's
DDP/NCCL machinery (reference: utils.py:20-34).

Gradient accumulation (`--accumulate_grad_batches`, reference train.sh:5-6)
is a `lax.scan` over micro-batches inside the same jit — no host round
trips between micro-steps.

Cross-replica BatchNorm (reference `sync_batchnorm=True`, utils.py:34)
comes free: under jit's global-view semantics the batch moments are
computed over the full (sharded) batch, XLA lowering the mean/variance
reductions to ICI collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lseg_tpu.ops.losses import segmentation_loss
from lseg_tpu.ops.metrics import seg_update


def make_train_step(
    ignore_index: int = -1,
    accumulate: int = 1,
) -> Callable:
    """Returns train_step(state, batch, text_features) -> (state, metrics).

    batch: {'image': (N, H, W, 3), 'target': (N, H, W) int32}.
    With accumulate > 1, N must be divisible by `accumulate`; micro-batches
    are scanned and gradients averaged, matching PL's
    accumulate_grad_batches semantics.
    """

    def loss_fn(params, batch_stats, apply_fn, img, tgt, text_features):
        out, mut = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            img,
            text_features,
            train=True,
            mutable=["batch_stats"],
        )
        loss = segmentation_loss(out, tgt, ignore_index=ignore_index)
        return loss, (out, mut["batch_stats"])

    def train_step(state, batch: Dict[str, jnp.ndarray], text_features):
        img, tgt = batch["image"], batch["target"]
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accumulate == 1:
            (loss, (out, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, state.apply_fn,
                img, tgt, text_features,
            )
        else:
            n = img.shape[0]
            m = n // accumulate
            imgs = img.reshape(accumulate, m, *img.shape[1:])
            tgts = tgt.reshape(accumulate, m, *tgt.shape[1:])

            def micro(carry, xs):
                acc_grads, stats = carry
                mi, mt = xs
                (l, (o, new_stats)), g = grad_fn(
                    state.params, stats, state.apply_fn, mi, mt,
                    text_features,
                )
                acc_grads = jax.tree_util.tree_map(
                    lambda a, b: a + b, acc_grads, g
                )
                return (acc_grads, new_stats), (l, o)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, new_stats), (losses, outs) = jax.lax.scan(
                micro, (zero, state.batch_stats), (imgs, tgts)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accumulate, grads)
            loss = jnp.mean(losses)
            out = outs.reshape(n, *outs.shape[2:])

        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        correct, labeled, inter, union = seg_update(
            out, tgt, nclass=out.shape[-1], ignore_index=ignore_index
        )
        metrics = {
            "loss": loss,
            "correct": correct,
            "labeled": labeled,
            "inter": inter,
            "union": union,
        }
        return new_state, metrics

    return train_step


def make_eval_step(ignore_index: int = -1) -> Callable:
    """eval_step(state, batch, text_features) -> metrics dict
    (validation_step, reference lsegmentation_module.py:86-112)."""

    def eval_step(state, batch, text_features):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            text_features,
            train=False,
        )
        loss = segmentation_loss(
            out, batch["target"], ignore_index=ignore_index
        )
        correct, labeled, inter, union = seg_update(
            out, batch["target"], nclass=out.shape[-1],
            ignore_index=ignore_index,
        )
        return {
            "loss": loss,
            "correct": correct,
            "labeled": labeled,
            "inter": inter,
            "union": union,
        }

    return eval_step
