"""Fused int8 transformer MLP as a Pallas TPU kernel.

fc1 (int8 MXU) -> tanh GELU -> per-row int8 requantize -> fc2 (int8
MXU) -> dequant + bias + residual add, all VMEM-resident per row tile.
The XLA path materializes the (N, T, 4D) fc1 activation in HBM three
times over (write, gelu+amax read, quantize read) plus the fc2 input
— ~150 MB per ViT-L block at the flagship shape. Here the hidden
activation never leaves VMEM.

Weights stay resident across grid steps (their index maps are
constant): fc1 4 MB + fc2 4 MB int8 for ViT-L. One grid step per
batch image (T=904 rows, hidden fp32 tile 14.8 MB) keeps everything
comfortably under VMEM.

Used by `models.vit.Block` when `mlp_fused` is on (fast serving with
the static-int8 tree and tanh GELU — the kernel hardcodes the
tanh-approx GELU of that config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xq_ref, sx_ref, res_ref, w1_ref, s1_ref, b1_ref,
            w2_ref, s2_ref, b2_ref, out_ref):
    xq = xq_ref[0]                        # (T, D) int8
    sx = sx_ref[0]                        # (T, 1) fp32
    res = res_ref[0]                      # (T, D) bf16 residual

    acc1 = jax.lax.dot_general(
        xq, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc1.astype(jnp.float32) * sx * s1_ref[:] + b1_ref[:]
    h = jax.nn.gelu(h, approximate=True)  # tanh GELU (fast config)

    # per-row requantize for the int8 fc2
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    sh = jnp.maximum(amax, 1e-8) / 127.0
    hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)

    acc2 = jax.lax.dot_general(
        hq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * sh * s2_ref[:] + b2_ref[:]
    out_ref[0] = (y + res.astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_t"))
def mlp_fused(
    xq: jnp.ndarray,    # (N, T, D) int8 — per-row quantized LN2 output
    sx: jnp.ndarray,    # (N, T, 1) fp32 row scales
    resid: jnp.ndarray,  # (N, T, D) bf16 residual stream
    w1q: jnp.ndarray,   # (D, H) int8
    s1: jnp.ndarray,    # (H,) fp32
    b1: jnp.ndarray,    # (H,) fp32
    w2q: jnp.ndarray,   # (H, D) int8
    s2: jnp.ndarray,    # (D,) fp32
    b2: jnp.ndarray,    # (D,) fp32
    interpret: bool = None,
    block_t: int = 256,
) -> jnp.ndarray:       # (N, T, D) bf16: resid + mlp(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = xq.shape
    h = w1q.shape[1]
    # row-tile the token axis: the fp32 hidden tile (bt, H) must stay
    # inside the 16 MB scoped-VMEM budget alongside the 8 MB resident
    # weights (a full-T tile OOMs at ViT-L: (904, 4096) fp32 = 14.8 MB)
    bt = min(block_t, t)
    nt = pl.cdiv(t, bt)

    out = pl.pallas_call(
        _kernel,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bt, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((d, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (0, 0)),
            pl.BlockSpec((h, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, sx.astype(jnp.float32), resid, w1q,
      s1.astype(jnp.float32).reshape(1, h),
      b1.astype(jnp.float32).reshape(1, h), w2q,
      s2.astype(jnp.float32).reshape(1, d),
      b2.astype(jnp.float32).reshape(1, d))
    return out
