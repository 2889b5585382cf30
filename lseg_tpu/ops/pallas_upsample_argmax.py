"""Fused ×2 bilinear (align_corners=True) upsample + argmax Pallas kernel.

The reference's output head upsamples the K-channel logit map to full
crop resolution and the caller argmaxes it
(reference: modules/models/lseg_net.py:203,219-221 + test_lseg.py /
lseg_app.py argmax). Done naively this materializes an
(N, 2H, 2W, K) fp32 tensor (221 MB per 480-crop at K=150) just to
immediately reduce it. This kernel streams row tiles: each grid step
DMAs a small input slab out of HBM, builds the row-interpolation
weights in-register from iota (align_corners ×2: src = o·(H−1)/(2H−1),
two taps with weight 1−|src−i|), forms the upsampled tile in VMEM via
two MXU matmuls, argmaxes over K, and writes only the int32 label
tile — the full-resolution logits never exist in HBM.

Serving path: `fused_correlate` (pallas_correlation.py) -> this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lseg_tpu.ops.resize import _interp_matrix


def _kernel(
    logits_hbm, aw_ref, out_ref, in_scratch, sem,
    *, h: int, w: int, k: int, kp: int, tile_o: int, tile_i: int,
):
    n_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    ob = t_idx * tile_o

    # input row window start: floor(ob * (h-1)/(2h-1)), clamped so the
    # tile_i-row slab stays in range
    ib = jax.lax.min(
        (ob * (h - 1)) // (2 * h - 1), jnp.int32(max(h - tile_i, 0))
    )

    dma = pltpu.make_async_copy(
        logits_hbm.at[n_idx, pl.ds(ib, tile_i)], in_scratch, sem
    )
    dma.start()

    # row-interpolation operator (tile_o, tile_i), built in-register:
    # out row ob+j samples src = (ob+j)(h-1)/(2h-1); its two taps are
    # floor(src), floor(src)+1 with triangle weights relu(1 - |src - i|)
    ratio = jnp.float32(h - 1) / jnp.float32(2 * h - 1)
    jo = jax.lax.broadcasted_iota(
        jnp.int32, (tile_o, tile_i), 0
    ).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (tile_o, tile_i), 1
    ).astype(jnp.float32)
    src = (jnp.float32(ob) + jo) * ratio - ib.astype(jnp.float32)
    ah = jnp.maximum(0.0, 1.0 - jnp.abs(src - ii))

    dma.wait()
    # matmuls run in the logits' own dtype (bf16 in the fast serving
    # path — fp32 MXU rate is 4x lower, which was the original kernel's
    # hidden cost) with fp32 accumulation.
    slab = in_scratch[:]                            # (tile_i, w, kp)
    aw = aw_ref[:].astype(slab.dtype)               # (2w, w)

    rows = jax.lax.dot_general(                     # (tile_o, w*kp)
        ah.astype(slab.dtype), slab.reshape(tile_i, w * kp),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(slab.dtype).reshape(tile_o, w, kp)
    up = jax.lax.dot_general(                       # (tile_o, 2w, kp)
        rows, aw,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(0, 2, 1)

    if kp != k:  # mask K padding out of the argmax
        lane = jax.lax.broadcasted_iota(jnp.int32, up.shape, 2)
        up = jnp.where(lane < k, up, -jnp.inf)
    out_ref[0] = jnp.argmax(up, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tile_o", "interpret")
)
def upsample2x_argmax(
    logits: jnp.ndarray,  # (N, H, W, K) fp32
    tile_o: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """argmax_K of the ×2 align_corners=True bilinear upsample, without
    materializing the upsampled logits. Returns (N, 2H, 2W) int32."""
    n, h, w, k = logits.shape
    oh, ow = 2 * h, 2 * w
    kp = -(-k // 128) * 128
    if kp != k:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, kp - k)))
    tile_i = min(tile_o // 2 + 2, h)
    n_tiles = -(-oh // tile_o)
    aw = np.asarray(_interp_matrix(w, ow, True))

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=w, k=k, kp=kp, tile_o=tile_o, tile_i=tile_i,
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # logits stay in HBM
            pl.BlockSpec((ow, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_o, ow), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile_o, ow),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_i, w, kp), logits.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(logits, jnp.asarray(aw))
    return out[:, :oh]


def _kernel_v2(
    logits_hbm, aw_ref, out_ref, in_scratch, sem,
    *, h: int, w: int, k: int, kp: int, tile_o: int, tile_i: int,
):
    """Transpose-free rewrite: the W-interp dot emits (tile_o, kp, 2w)
    directly (contraction over w with the logits' K axis as a batch-free
    middle dim) and the argmax reduces over the SUBLANE (kp) axis — no
    in-VMEM transposes, bf16 matmuls, larger row tiles."""
    n_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    ob = t_idx * tile_o

    ib = jax.lax.min(
        (ob * (h - 1)) // (2 * h - 1), jnp.int32(max(h - tile_i, 0))
    )
    dma = pltpu.make_async_copy(
        logits_hbm.at[n_idx, pl.ds(ib, tile_i)], in_scratch, sem
    )
    dma.start()

    ratio = jnp.float32(h - 1) / jnp.float32(2 * h - 1)
    jo = jax.lax.broadcasted_iota(
        jnp.int32, (tile_o, tile_i), 0
    ).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (tile_o, tile_i), 1
    ).astype(jnp.float32)
    src = (jnp.float32(ob) + jo) * ratio - ib.astype(jnp.float32)
    ah = jnp.maximum(0.0, 1.0 - jnp.abs(src - ii))

    dma.wait()
    slab = in_scratch[:]                            # (tile_i, w, kp)
    aw = aw_ref[:].astype(slab.dtype)               # (2w, w)

    rows = jax.lax.dot_general(                     # (tile_o, w*kp)
        ah.astype(slab.dtype), slab.reshape(tile_i, w * kp),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(slab.dtype).reshape(tile_o, w, kp)
    # contraction over w; result (tile_o, kp, 2w) — K lands on the
    # sublane axis of each (kp, 2w) tile, no transpose needed
    up = jax.lax.dot_general(
        rows, aw,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (tile_o, kp, 2w)
    if kp != k:
        sub = jax.lax.broadcasted_iota(jnp.int32, up.shape, 1)
        up = jnp.where(sub < k, up, -jnp.inf)
    out_ref[0] = jnp.argmax(up, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tile_o", "interpret")
)
def upsample2x_argmax_v2(
    logits: jnp.ndarray,  # (N, H, W, K)
    tile_o: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """argmax_K of the x2 align_corners=True bilinear upsample without
    materializing the upsampled logits — transpose-free kernel (see
    `_kernel_v2`). Returns (N, 2H, 2W) int32."""
    n, h, w, k = logits.shape
    oh, ow = 2 * h, 2 * w
    kp = -(-k // 128) * 128
    if kp != k:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, kp - k)))
    tile_i = min(tile_o // 2 + 2, h)
    n_tiles = -(-oh // tile_o)
    aw = np.asarray(_interp_matrix(w, ow, True))

    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, h=h, w=w, k=k, kp=kp, tile_o=tile_o,
            tile_i=tile_i,
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ow, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_o, ow), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile_o, ow),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_i, w, kp), logits.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(logits, jnp.asarray(aw))
    return out[:, :oh]
