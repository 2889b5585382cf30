"""Fused per-pixel image–text correlation as a Pallas TPU kernel.

The north-star op (BASELINE.json): L2-normalization of pixel embeddings
AND label embeddings + the (HW×C)·(C×K) similarity matmul + temperature
scaling in ONE VMEM-resident pass. The XLA version
(`lseg_tpu.ops.correlation.correlate`) materializes both normalized
operands in HBM; here each row tile is normalized in VMEM and goes
straight to the MXU, so HBM traffic is exactly one read of the pixels +
one read of the text matrix + one write of the logits.

Reference semantics (modules/models/lseg_net.py:185-196):
    logits = scale * (img / ||img||) @ (txt / ||txt||)^T

Shapes are padded to MXU-friendly tiles by the wrapper; K (label count)
is padded to a lane multiple and sliced back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, t_ref, o_ref, *, scale: float, mm_dtype):
    # x: (TM, C) pixel-embedding tile; t: (Kp, C) full text matrix.
    x = x_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    xn = x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
    )
    # zero rows (K padding) keep norm 0 via the max guard -> logits 0
    tn = t * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(t * t, axis=-1, keepdims=True), 1e-24)
    )
    # mm_dtype=bf16 runs the MXU at 2x the fp32 rate (fast serving);
    # normalization stays fp32 either way
    o = scale * jax.lax.dot_general(
        xn.astype(mm_dtype), tn.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("logit_scale", "tile_m", "interpret",
                              "compute_dtype")
)
def fused_correlate(
    image_features: jnp.ndarray,  # (N, H, W, C)
    text_features: jnp.ndarray,   # (K, C)
    logit_scale: float = 1.0 / 0.07,
    tile_m: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Temperature-scaled cosine-similarity logits (N, H, W, K) in
    `compute_dtype` (fp32 default; bfloat16 = fast-serving matmul rate
    and logit stream, normalization fp32 in VMEM either way).

    Drop-in for `ops.correlation.correlate` (without the fp16-emulation
    parity knob, which stays on the XLA path)."""
    n, h, w, c = image_features.shape
    k = text_features.shape[0]
    m = n * h * w
    mp = _round_up(m, tile_m)
    kp = _round_up(k, 128)

    x = image_features.reshape(m, c)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    t = text_features.astype(jnp.float32)
    if kp != k:
        t = jnp.pad(t, ((0, kp - k), (0, 0)))

    out_dt = jnp.dtype(compute_dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(logit_scale),
                          mm_dtype=out_dt),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), out_dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * c,
            bytes_accessed=mp * c * x.dtype.itemsize
            + kp * c * 4 + mp * kp * out_dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, t)
    return out[:m, :k].reshape(n, h, w, k)



def _head1_kernel(xq_ref, w_ref, sc_ref, b_ref, t_ref, o_ref, *, eps,
                  k_out):
    """One row tile: int8 head1 1x1 conv (as a matmul) -> pixel
    embedding tile in VMEM -> deferred-norm correlation against the
    resident text matrix. The (M, E) embedding map never exists in HBM
    (it costs a 472 MB write + 2x 472 MB reads per batch-8 480-crop on
    the XLA path: head1 out, the sum-of-squares pass, and the
    correlation's operand read)."""
    xq = xq_ref[:]                        # (TM, C) int8
    acc = jax.lax.dot_general(
        xq, w_ref[:],                     # (C, E) int8
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    e = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]   # (TM, E) fp32
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(e * e, axis=1, keepdims=True), eps))
    lo = jax.lax.dot_general(
        e.astype(jnp.bfloat16), t_ref[:],  # (Kp, E) bf16
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # write the UNPADDED K directly: the (mp, K) output bitcasts to
    # (N, H, W, K) for free, where slicing a 128-padded output costs a
    # 0.65 ms relayout copy at the flagship shape (HLO: copy.80)
    o_ref[:] = (lo * inv).astype(o_ref.dtype)[:, :k_out]


@functools.partial(
    jax.jit, static_argnames=("logit_scale", "tile_m", "interpret")
)
def head1_correlate_fused(
    xq: jnp.ndarray,      # (N, H, W, C) int8 — quantized path1
    sx: jnp.ndarray,      # fp32 scalar activation scale (amax/127)
    w1q: jnp.ndarray,     # (1, 1, C, E) int8 head1 kernel
    s1: jnp.ndarray,      # (E,) fp32 per-channel weight scales
    b1: jnp.ndarray,      # (E,) fp32 head1 bias
    text_features: jnp.ndarray,  # (K, E) fp32 raw text features
    logit_scale: float = 1.0 / 0.07,
    tile_m: int = 512,
    interpret: bool = None,
) -> jnp.ndarray:         # (N, H, W, K) bf16 deferred-norm logits
    """Fused int8 head1 projection + temperature-scaled deferred-norm
    correlation (reference: modules/models/lseg_net.py:185-196 with the
    exact (e/|e|)*t == (e*t)/|e| reassociation of the fast head)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = xq.shape
    e_dim = w1q.shape[-1]
    k = text_features.shape[0]
    m = n * h * w
    mp = _round_up(m, tile_m)
    kp = _round_up(k, 128)

    x2 = xq.reshape(m, c)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    t = text_features.astype(jnp.float32)
    tn = t * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))
    tn = (logit_scale * tn).astype(jnp.bfloat16)
    if kp != k:
        tn = jnp.pad(tn, ((0, kp - k), (0, 0)))

    sc = (sx.astype(jnp.float32).reshape(1, 1)
          * s1.astype(jnp.float32).reshape(1, e_dim))
    out = pl.pallas_call(
        functools.partial(_head1_kernel, eps=1e-24, k_out=k),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), jnp.bfloat16),
        interpret=interpret,
    )(x2, w1q.reshape(c, e_dim), sc,
      b1.astype(jnp.float32).reshape(1, e_dim), tn)
    return out[:m].reshape(n, h, w, k)
