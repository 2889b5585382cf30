"""Per-pixel image–text correlation head.

The capability core of LSeg (reference: modules/models/lseg_net.py:185-196):
L2-normalize per-pixel embeddings (N,H,W,C) and label embeddings (K,C),
then temperature-scaled cosine similarity -> (N,H,W,K) logits.

Two implementations:
- `correlate` — plain XLA einsum (fusion-friendly; default).
- a fused Pallas kernel in `lseg_tpu.ops.pallas_correlation` that folds
  normalization + matmul + temperature into one VMEM-resident pass
  (used on TPU for large HW×K).

`emulate_fp16=True` reproduces the reference's quirk of casting to fp16
before the matmul (`image_features.half() @ text_features.t()`,
lseg_net.py:194 — CLIP text features are fp16 on GPU) for bit-parity
golden tests. Production path keeps bf16/fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """x / ||x||_2 along `axis` (torch `x / x.norm(dim=-1, keepdim=True)`).
    The eps floor only guards degenerate all-zero vectors (real CLIP
    embeddings have norms ~O(1), where the floor is a no-op)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                            keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def correlate(
    image_features: jnp.ndarray,  # (N, H, W, C)
    text_features: jnp.ndarray,   # (K, C)
    logit_scale: float = 1.0 / 0.07,
    emulate_fp16: bool = False,
    compute_dtype=jnp.float32,
    defer_pixel_norm: bool = False,
) -> jnp.ndarray:
    """Temperature-scaled cosine similarity logits (N, H, W, K) in
    `compute_dtype` (fp32 default; bfloat16 halves the NHWK logit
    stream for the fast serving head — normalization stays fp32).

    `defer_pixel_norm` moves the per-pixel L2 normalization AFTER the
    matmul: (e/|e|)·t == (e·t)/|e| exactly, so this is a pure
    reassociation (same math, different fp rounding) — but it avoids
    materializing the normalized (N,H,W,C) embedding map (~0.5 GB at
    batch 8, 480 crop): the raw head1 output feeds the MXU directly and
    the 1/|e| broadcast fuses into the (N,H,W,K) logit epilogue."""
    if defer_pixel_norm and not emulate_fp16:
        e = image_features
        txt = l2_normalize(text_features.astype(jnp.float32))
        inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(
            jnp.square(e.astype(jnp.float32)), axis=-1, keepdims=True),
            1e-24))
        logits = jnp.einsum(
            "nhwc,kc->nhwk", e.astype(compute_dtype),
            (logit_scale * txt).astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return (logits.astype(jnp.float32) * inv).astype(compute_dtype)
    img = l2_normalize(image_features.astype(jnp.float32))
    txt = l2_normalize(text_features.astype(jnp.float32))
    if emulate_fp16:
        # parity path: scale AFTER the fp16 matmul, exactly like the
        # reference's `logit_scale * img.half() @ txt.t()`
        img = img.astype(jnp.float16)
        txt = txt.astype(jnp.float16)
        logits = jnp.einsum(
            "nhwc,kc->nhwk", img, txt, preferred_element_type=jnp.float32
        )
        return logit_scale * logits.astype(jnp.float32)
    # fold the temperature into the (K, C) text operand: saves a full
    # read+write of the (N, H, W, K) logit tensor (profiler: ~0.75 ms
    # per batch-8 480-crop); identical math in fp32
    logits = jnp.einsum(
        "nhwc,kc->nhwk", img.astype(compute_dtype),
        (logit_scale * txt).astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits.astype(compute_dtype)
