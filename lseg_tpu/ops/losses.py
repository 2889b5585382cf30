"""Segmentation losses — jit-compiled equivalents of the reference's
PyTorch-Encoding `SegmentationLosses` (reference:
modules/lsegmentation_module.py:236-244; the encoding package implements
2D cross-entropy with ignore_index, an optional auxiliary-head CE at
weight `aux_weight`, and an optional "semantic encoding" BCE loss on
per-image class presence at weight `se_weight`).

All reductions are masked means over valid (non-ignore) pixels, computed
in fp32. No host sync; everything stays on device under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,   # (N, H, W, K) fp32
    target: jnp.ndarray,   # (N, H, W) int32 class ids
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean softmax cross-entropy over pixels where target != ignore_index
    (torch F.cross_entropy(ignore_index=...) semantics: mean over valid)."""
    valid = target != ignore_index
    # Clamp ignored targets into range so the gather is safe; their
    # contribution is masked out of the mean.
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, tgt[..., None], axis=-1
    ).squeeze(-1)
    nll = logz - picked
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def se_loss(
    logits_se: jnp.ndarray,  # (N, K) per-image class-presence logits
    target: jnp.ndarray,     # (N, H, W) int32
    nclass: int,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """BCE-with-logits against the binary "does class k appear in this
    image" vector (the encoding package's SE-loss)."""
    valid = target != ignore_index
    tgt = jnp.where(valid, target, nclass).astype(jnp.int32)
    onehot = jax.nn.one_hot(tgt, nclass + 1, dtype=jnp.float32)[..., :nclass]
    present = (jnp.sum(onehot, axis=(1, 2)) > 0).astype(jnp.float32)  # (N,K)
    x = logits_se.astype(jnp.float32)
    # numerically stable BCE-with-logits
    bce = jnp.maximum(x, 0) - x * present + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(bce)


def segmentation_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = -1,
    aux_logits: Optional[jnp.ndarray] = None,
    aux_weight: float = 0.2,
    se_logits: Optional[jnp.ndarray] = None,
    se_weight: float = 0.2,
    nclass: Optional[int] = None,
) -> jnp.ndarray:
    """Full criterion: CE + aux_weight·CE(aux) + se_weight·SE
    (reference: lsegmentation_module.py:236-244; LSeg itself trains with
    plain CE — aux/se default off)."""
    loss = cross_entropy(logits, target, ignore_index)
    if aux_logits is not None:
        loss = loss + aux_weight * cross_entropy(
            aux_logits, target, ignore_index
        )
    if se_logits is not None:
        loss = loss + se_weight * se_loss(
            se_logits, target, nclass or logits.shape[-1], ignore_index
        )
    return loss
