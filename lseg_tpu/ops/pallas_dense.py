"""Row-tiled Pallas dense matmul with fused bias + residual epilogue.

Profiler finding (CLAUDE.md): XLA's emitter for the transformer MLP's
second projection fused with the residual add runs at ~1/3 of the
chip's matmul rate at our shapes ((N*T, 4D) @ (4D, D) + residual). This
kernel keeps the full weight matrix resident in VMEM and streams row
tiles of the activations through the MXU with the epilogue applied
in-register.

Targets K*N*2bytes <= ~8 MB (ViT-L: 4096x1024 bf16 = 8 MB); the wrapper
falls back to plain XLA when the weight does not fit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, r_ref, o_ref, *, out_dtype):
    acc = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )
    acc = acc + b_ref[:].astype(jnp.float32)
    if r_ref is not None:
        acc = acc + r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "interpret", "out_dtype"),
)
def dense_residual(
    x: jnp.ndarray,                      # (M, K) bf16/f32
    w: jnp.ndarray,                      # (K, N)
    b: jnp.ndarray,                      # (N,)
    residual: Optional[jnp.ndarray] = None,  # (M, N)
    tile_m: int = 256,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ w + b (+ residual), fp32 accumulation, row-tiled."""
    m, k = x.shape
    n = w.shape[1]
    mp = _round_up(m, tile_m)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, mp - m), (0, 0)))

    has_r = residual is not None
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w.astype(x.dtype), b.reshape(1, n).astype(jnp.float32)]
    if has_r:
        in_specs.append(
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual)
        kern = functools.partial(_kernel, out_dtype=out_dtype)
    else:
        def kern(x_ref, w_ref, b_ref, o_ref):
            _kernel(x_ref, w_ref, b_ref, None, o_ref,
                    out_dtype=out_dtype)

    out = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * x.dtype.itemsize
            + k * n * x.dtype.itemsize + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m]
