"""Int8 quantized matmul paths (opt-in serving modes).

v5e's MXU runs int8 at 2× the bf16 rate (394 vs 197 TOPS). This module
provides two quantized dense layers for the transformer hot path:

- `QuantDense` (dynamic): weights are symmetric per-output-channel int8
  quantized from the fp32 params AT APPLY TIME. Checkpoint-tree
  compatible with nn.Dense, but the per-call weight quantize re-reads
  the full fp32 weight tree every forward (~1.2 GB HBM for ViT-L) —
  measured SLOWER than bf16 end to end (92.3 vs 101 img/s, round 1).
- `StaticQuantDense` (static): weights are PRE-quantized once at load
  time by `quantize_tree` and stored in the serving param tree as
  int8 `kernel_q` + fp32 per-channel `scale`. No per-call weight pass,
  and the weight HBM stream drops 4× vs fp32 / 2× vs bf16. This is the
  serving mode that can beat the bf16 roofline.

Both use: symmetric per-row (per-token) dynamic int8 activations,
int32 MXU accumulation, dequantized as (row_scale ⊗ col_scale).

Accuracy: per-channel weight + per-token activation symmetric
quantization is the standard recipe for ViT inference; parity-sensitive
paths keep the bf16/fp32 route (`quant_int8=False`, the default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """(..., K) -> int8 with per-row scale (..., 1)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """(K, N) -> int8 with per-column scale (1, N)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul_prequant(x: jnp.ndarray, wq: jnp.ndarray,
                         sw: jnp.ndarray,
                         out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(wq, sw) with per-token dynamic int8 activations
    and an int32 MXU accumulation. x: (..., K); wq int8 (K, N); sw fp32
    (N,) or (1, N) per-output-channel scales."""
    xq, sx = quantize_rows(x)
    lead = xq.shape[:-1]
    y = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx.reshape(-1, 1) * sw.reshape(1, -1)
    return y.reshape(*lead, wq.shape[-1]).astype(out_dtype)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ w with both operands dynamically int8-quantized and an
    int32 MXU accumulation. x: (..., K); w: (K, N)."""
    wq, sw = quantize_cols(w)
    return int8_matmul_prequant(x, wq, sw, out_dtype=out_dtype)


class QuantDense(nn.Module):
    """Drop-in nn.Dense with the int8 dynamic-quant matmul. Same param
    tree (fp32 'kernel'/'bias'), so checkpoints are interchangeable with
    nn.Dense."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, self.features),
            jnp.float32,
        )
        y = int8_matmul(x, kernel, out_dtype=self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + b.astype(self.dtype)
        return y


class StaticQuantDense(nn.Module):
    """nn.Dense variant consuming PRE-quantized weights: int8 `kernel_q`
    + fp32 per-output-channel `scale` (+ fp32 `bias`). Build the serving
    param tree from an fp32 tree with `quantize_tree` — `model.init`
    only creates placeholder zeros/ones."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (k, self.features), jnp.int8
        )
        sw = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = int8_matmul_prequant(x, kq, sw, out_dtype=self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + b.astype(self.dtype)
        return y


# Transformer-block projections eligible for static quantization:
# attention qkv/proj and MLP fc1/fc2 (the ViT matmul hot path —
# reference regime: modules/models/lseg_vit.py:196-197, the 24 timm
# blocks). Matched by (parent-module, leaf-module) name so decoder
# convs / readout projections are never touched.
_QUANT_LEAVES = {("attn", "qkv"), ("attn", "proj"),
                 ("mlp", "fc1"), ("mlp", "fc2")}


def quantize_tree(params, leaves=None):
    """fp32 param tree -> static-quant serving tree.

    For every Dense subtree ``{kernel, bias}`` at a path whose last two
    module names are in `leaves` (default: the transformer-block
    projections), replace ``kernel`` (..., K, N) with ``kernel_q`` int8
    (..., K, N) + ``scale`` fp32 (..., N) — symmetric per-output-channel,
    scale = max|w|/127, the exact grid `QuantDense` uses dynamically.
    Leading axes (nn.scan block stacking) are preserved. Everything else
    is passed through unchanged, so the result drops into
    ``model.apply`` for a model built with ``quant_int8='static'``.
    """
    leaves = _QUANT_LEAVES if leaves is None else leaves

    from collections.abc import Mapping

    def rec(node, path):
        if not isinstance(node, Mapping):
            return node
        if "kernel" in node and tuple(path[-2:]) in leaves:
            w = jnp.asarray(node["kernel"], jnp.float32)
            amax = jnp.max(jnp.abs(w), axis=-2)
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127)
            out = {"kernel_q": q.astype(jnp.int8), "scale": scale}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: rec(v, path + (k,)) for k, v in node.items()}

    return rec(params, ())
