"""Fused LayerNorm + per-row int8 quantize (TPU Pallas).

The static-int8 MLP path computes `quantize_rows(LayerNorm(x))` before
fc1. In XLA that is a cross-lane LN reduce pass plus an amax/round
quantize pass over the (N*T, D) residual stream — ~0.1-0.2 ms/block of
pure VPU/HBM streams at the flagship shape, and the first scan
iteration's LN reduce gets peeled into a ~0.33 ms standalone fusion
per segment (CLAUDE.md round-2/3 profiles). This kernel does the whole
thing in one VMEM pass per (batch, row-block): read the bf16 rows
once, LN in fp32, amax -> scale, emit the int8 rows + fp32 row scales.
The normalized bf16 tensor never exists in HBM.

Complements `flash_attention_ln_qkv_fused` (ops/pallas_attention.py),
which does the same for norm1 inside the attention kernel — together
no standalone LayerNorm op remains in the transformer scan body.

reference: timm ViT Block pre-norm semantics
(modules/models/lseg_vit.py:196-197 block loop; LN eps 1e-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32)                  # (bt, D)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
    amax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    s_ref[0] = s
    q_ref[0] = jnp.clip(jnp.round(xn / s), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret", "eps", "block_t"))
def ln_quantize_rows(
    x: jnp.ndarray,        # (N, T, D) bf16/fp32 raw residual stream
    ln_scale: jnp.ndarray,  # (D,) fp32
    ln_bias: jnp.ndarray,   # (D,) fp32
    interpret: bool = None,
    eps: float = 1e-6,
    block_t: int = 1024,
):
    """-> (q (N, T, D) int8, s (N, T, 1) fp32 row scales): identical
    math to `quantize_rows(LayerNorm(x))` with fp32 LN (int8 values can
    differ from the XLA path only at round-to-nearest bin edges)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = x.shape
    bt = min(block_t, t)
    assert t % bt == 0 and t % 8 == 0 and d % 128 == 0, (t, bt, d)
    grid = (n, t // bt)
    q, s = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda ni, ti: (ni, ti, 0)),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0)),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, d), lambda ni, ti: (ni, ti, 0)),
            pl.BlockSpec((1, bt, 1), lambda ni, ti: (ni, ti, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), jnp.int8),
            jax.ShapeDtypeStruct((n, t, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32).reshape(1, d),
      ln_bias.astype(jnp.float32).reshape(1, d))
    return q, s


def int8_matmul_preact(xq, sx, wq, sw, out_dtype=jnp.bfloat16):
    """y = dequant(xq, sx) @ dequant(wq, sw) on the int8 MXU — the
    `int8_matmul_prequant` core for activations already quantized (by
    `ln_quantize_rows` or a fused kernel). xq (..., K) int8, sx (..., 1)
    fp32, wq (K, N) int8, sw (N,) fp32."""
    lead = xq.shape[:-1]
    y = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx.reshape(-1, 1) * sw.reshape(1, -1)
    return y.reshape(*lead, wq.shape[-1]).astype(out_dtype)
