"""Fused decoder-tail Pallas kernel: ×2 bilinear upsample + activation
quantize + int8 1×1 out_conv in one VMEM-resident pass.

Reference semantics being fused (modules/models/lseg_blocks.py:293-358):
the FeatureFusionBlock tail is `interpolate(x, scale_factor=2,
align_corners=True)` followed by the 1×1 `out_conv`. On the int8 serving
path (`decoder_quant='static_cal'`) the XLA chain materializes, at the
refinenet1 shape (batch 8, 120→240, 256ch):

    upsample write (236 MB bf16) -> quantize read+write (236+118 MB)
    -> conv read (118 MB) -> conv write (236 MB bf16)

i.e. ~710 MB of HBM traffic between two matmuls with only elementwise
work in between — exactly the round-trip pattern the fused head kernel
(`ops/pallas_correlation.head1_correlate_fused`) eliminated. Here each
(image, row-band) grid step H-blends the band in VMEM (2-tap
align-corners rows, exact `ops.resize._interp_matrix` weights), runs the
W-interp as back-to-back MXU matmuls, quantizes in VMEM, and applies the
int8 out_conv as ONE band-wide matmul. HBM traffic drops to one read of
x + one write of the result; with `out_scale` set the result is emitted
int8 (the next consumer's calibrated activation grid), which also
removes the consumer-side quantize pass (at refinenet1 the consumer is
the fused serving head).

One matmul family per phase (W-interp queue, then a single conv matmul)
— this respects the measured fusion LESSON (serial multi-matmul chains
with VPU between them lose; single-phase round-trip elimination wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(ho_ref, w0_ref, w1_ref, ss_ref,  # SMEM: floors, taps,
                                                  # scales
                 xp_ref, xc_ref, xn_ref,  # (1, R, W, C) prev/center/next
                 wi_ref,                  # (2W, W) bf16 W-interp operator
                 wq_ref,                  # (C, Co) int8 out_conv kernel
                 sc_ref,                  # (1, Co) fp32 s_in * w_scale
                 b_ref,                   # (1, Co) fp32 bias
                 o_ref,                   # (1, 2R, 2W, Co) out band
                 xs_ref,                  # VMEM (R+2, W, C) source rows
                 hb_ref,                  # VMEM (2R, W, C) H-blended rows
                 ub_ref,                  # VMEM (2R*2W, C) upsampled band
                 *, rows, out_int8):
    band = pl.program_id(1)
    rp2 = rows + 2
    _, _, w_sz, c = xc_ref.shape
    co = wq_ref.shape[1]

    # ---- stage the rp2 candidate source rows (prev-last | center |
    # next-first); clamped edge blocks are never indexed (align-corners
    # floors stay inside the band at the boundaries) ----
    for r in range(rp2):
        if r == 0:
            xs_ref[r] = xp_ref[0, rows - 1]
        elif r == rp2 - 1:
            xs_ref[r] = xn_ref[0, 0]
        else:
            xs_ref[r] = xc_ref[0, r - 1]

    # ---- phase 1: H-blend every output row (VPU). Tap weights are the
    # bf16-ROUNDED _interp_matrix entries (cast separately, exactly as
    # resize_bilinear casts the operator to its bf16 compute dtype), so
    # the fused path is bit-identical to the XLA chain's H stage.
    for j in range(2 * rows):
        jo = 2 * rows * band + j
        rel = ho_ref[jo] - (band * rows - 1)
        pair = xs_ref[pl.ds(rel, 2)]                   # (2, W, C)
        hb_ref[j] = (
            pair[0].astype(jnp.float32) * w0_ref[jo]
            + pair[1].astype(jnp.float32) * w1_ref[jo]
        ).astype(hb_ref.dtype)

    # ---- phase 2: W-interp, 2R static MXU matmuls back-to-back ----
    wi = wi_ref[:]
    for j in range(2 * rows):
        ub_ref[pl.ds(j * 2 * w_sz, 2 * w_sz)] = jax.lax.dot_general(
            wi, hb_ref[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ub_ref.dtype)                         # (2W, C)

    # ---- phase 3: quantize band + ONE int8 conv matmul + epilogue ----
    q = jnp.clip(jnp.round(ub_ref[:].astype(jnp.float32) * ss_ref[0]),
                 -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]  # (2R*2W, Co)
    if out_int8:
        y = jnp.clip(jnp.round(y * ss_ref[1]), -127, 127)
    o_ref[0] = y.astype(o_ref.dtype).reshape(2 * rows, 2 * w_sz, co)


def _pick_rows(h: int) -> int:
    for r in (10, 8, 12, 6, 15, 5, 4, 3, 2, 1):
        if h % r == 0:
            return r
    return 1


def tail_fusable(h: int, w: int, c: int, co: int) -> bool:
    """Shape gate for `fused_upsample_outconv`: lane-aligned channels and
    a sublane-clean upsampled width (the in-kernel band reshape)."""
    return c % 128 == 0 and co % 128 == 0 and (2 * w) % 8 == 0 and h >= 2


@functools.partial(
    jax.jit,
    static_argnames=("rows", "out_int8", "interpret"),
)
def fused_upsample_outconv(
    x: jnp.ndarray,        # (N, H, W, C) bf16 — rcu2 output
    wq: jnp.ndarray,       # (1, 1, C, Co) or (C, Co) int8 out_conv kernel
    sw: jnp.ndarray,       # (Co,) fp32 per-channel weight scales
    b: jnp.ndarray,        # (Co,) fp32 out_conv bias
    s_in: jnp.ndarray,     # fp32 scalar: input act scale (amax/127)
    out_scale: jnp.ndarray | None = None,  # fp32 scalar: emit-int8 grid
    rows: int | None = None,
    out_int8: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """×2 align-corners bilinear upsample + static-int8 1×1 conv, fused.

    Drop-in for `upsample2x(x, align_corners=True, compute_dtype=bf16)`
    followed by `StaticQuantConv(Co, (1,1), static_act=True)` on the
    serving path. With `out_int8=True` (and `out_scale`, the consumer's
    calibrated act scale) the result is the consumer-ready int8 tensor.
    Scales stay traced operands (SMEM), so calibrated params flow
    through jit without retraces.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    wq2 = wq.reshape(wq.shape[-2], wq.shape[-1])
    co = wq2.shape[-1]
    if rows is None:
        rows = _pick_rows(h)
    assert h % rows == 0, (h, rows)
    nb = h // rows

    from lseg_tpu.ops.resize import _interp_matrix

    ah = _interp_matrix(h, 2 * h, True)
    ho = np.argmax(ah > 0, axis=1).astype(np.int32)
    # the XLA chain applies the bf16-cast operator: round each tap to
    # bf16 separately (bf16(1-f) != 1 - bf16(f))
    ah_b = ah.astype(np.dtype(jnp.bfloat16)).astype(np.float32)
    idx = np.arange(2 * h)
    w0 = ah_b[idx, ho]
    hi = np.minimum(ho + 1, h - 1)
    w1 = np.where(hi > ho, ah_b[idx, hi], 0.0).astype(np.float32)
    wi = jnp.asarray(_interp_matrix(w, 2 * w, True), jnp.bfloat16)

    s_in = s_in.astype(jnp.float32).reshape(())
    sc = (s_in * sw.astype(jnp.float32)).reshape(1, co)
    inv_out = (1.0 / out_scale.astype(jnp.float32).reshape(())
               if out_int8 else jnp.float32(1.0))
    scales = jnp.stack([1.0 / s_in, inv_out])          # SMEM (2,)

    xblk = lambda fn: pl.BlockSpec(
        (1, rows, w, c), lambda ni, ri: (ni, fn(ri), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dt = jnp.int8 if out_int8 else x.dtype
    out = pl.pallas_call(
        functools.partial(_tail_kernel, rows=rows, out_int8=out_int8),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ho
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scales
            xblk(lambda ri: jnp.maximum(ri - 1, 0)),
            xblk(lambda ri: ri),
            xblk(lambda ri: jnp.minimum(ri + 1, nb - 1)),
            pl.BlockSpec((2 * w, w), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * rows, 2 * w, co),
                               lambda ni, ri: (ni, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, co), out_dt),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, w, c), x.dtype),
            pltpu.VMEM((2 * rows, w, c), jnp.bfloat16),
            pltpu.VMEM((2 * rows * 2 * w, c), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(ho), jnp.asarray(w0), jnp.asarray(w1), scales,
      x, x, x, wi, wq2, sc, b.astype(jnp.float32).reshape(1, co))
    return out
