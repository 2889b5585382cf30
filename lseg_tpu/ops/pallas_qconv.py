"""Fused int8 ResidualConvUnit as one Pallas kernel.

Reference semantics (modules/models/lseg_blocks.py:222-290):

    out = x + bn2(conv2(relu(bn1(conv1(relu(x))))))

On the static-int8 serving decoder the XLA chain materializes, per RCU
at the refinenet1 shape (batch 8, 120×120, 256ch, bf16):

    relu+quantize pass (59+29 MB) -> conv1 (29+59) -> bn+relu+quantize
    (59+29) -> conv2 (29+59) -> residual read (59) + out write (59)

≈ 470 MB of HBM for ~34 GFLOP of int8 conv — heavily bandwidth-bound.
This kernel stages one row band of x in VMEM and runs the whole unit
there: quantize → conv1 (as ONE im2col matmul: 9 shifted copies
lane-concatenated to a (rows·W, 9C) operand) → folded-BN affine + relu
→ requantize → conv2 → folded-BN affine → + residual, writing only the
bf16 result. HBM traffic drops to ~one read + one write of x.

The two conv matmuls per grid step are separated by elementwise-only
VPU work; each is a single large MXU op ((rows·W, 9C) @ (9C, Co)), so
this stays on the winning side of the measured fusion LESSON (layout /
round-trip elimination, not a serial small-matmul chain).

BatchNorm (eval mode) folds into the dequant epilogue as a per-channel
affine: a = γ/√(σ²+ε), c = β − μ·a applied to the dequantized conv
output (conv bias, when BN is off, folds into c the same way). Scales
are calibrated constants (`decoder_quant='static_cal'`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _build_q9(q_ref, q9_ref, rows_out, w_sz, c):
    """Scatter the 9 shifted (rows_out, W, C) views of the padded int8
    block `q_ref` ((rows_out+2, W+2, C)) into the lane-concatenated
    im2col operand q9 ((rows_out*W, 9C))."""
    for ky in range(3):
        for kx in range(3):
            blk = (3 * ky + kx) * c
            q9_ref[:, blk:blk + c] = (
                q_ref[ky:ky + rows_out, kx:kx + w_sz, :]
                .reshape(rows_out * w_sz, c))


def _rcu_kernel(ss_ref,                   # SMEM (2,): inv_s1, inv_s2
                xp_ref, xc_ref, xn_ref,   # (1, R, W, C) bf16 blocks
                w1_ref, w2_ref,           # (9C, C) int8 im2col kernels
                d1_ref, e1_ref,           # (1, C) fp32 conv1 affine
                d2_ref, e2_ref,           # (1, C) fp32 conv2 affine
                o_ref,                    # (1, R, W, C) bf16 out
                xs_ref,                   # VMEM (R+4, W+2, C) bf16
                q1_ref,                   # VMEM (R+4, W+2, C) int8
                q9a_ref,                  # VMEM ((R+2)*W, 9C) int8
                q2_ref,                   # VMEM (R+2, W+2, C) int8
                q9b_ref,                  # VMEM (R*W, 9C) int8
                *, rows):
    band = pl.program_id(1)
    nb = pl.num_programs(1)
    _, _, w_sz, c = xc_ref.shape

    # ---- stage x rows with 2-row halo + zero W padding; image-edge
    # halo rows are zeros (conv pad=1 twice) ----
    xs_ref[:] = jnp.zeros_like(xs_ref)
    first = band == 0
    last = band == nb - 1
    zero_row = jnp.zeros((w_sz, c), xs_ref.dtype)
    xs_ref[0, 1:w_sz + 1] = jnp.where(first, zero_row, xp_ref[0, rows - 2])
    xs_ref[1, 1:w_sz + 1] = jnp.where(first, zero_row, xp_ref[0, rows - 1])
    for r in range(rows):
        xs_ref[2 + r, 1:w_sz + 1] = xc_ref[0, r]
    xs_ref[rows + 2, 1:w_sz + 1] = jnp.where(last, zero_row, xn_ref[0, 0])
    xs_ref[rows + 3, 1:w_sz + 1] = jnp.where(last, zero_row, xn_ref[0, 1])

    # ---- prologue: relu + quantize on conv1's calibrated grid ----
    q1_ref[:] = jnp.clip(
        jnp.round(jnp.maximum(xs_ref[:].astype(jnp.float32), 0.0)
                  * ss_ref[0]),
        -127, 127).astype(jnp.int8)

    # ---- conv1 as one im2col matmul over rows+2 output rows ----
    _build_q9(q1_ref, q9a_ref, rows + 2, w_sz, c)
    acc1 = jax.lax.dot_general(
        q9a_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc1.astype(jnp.float32) * d1_ref[:] + e1_ref[:]
    # bn1 + relu + requantize on conv2's grid
    hq = jnp.clip(jnp.round(jnp.maximum(h, 0.0) * ss_ref[1]),
                  -127, 127).astype(jnp.int8)
    q2_ref[:] = jnp.zeros_like(q2_ref)
    q2_ref[:, 1:w_sz + 1] = hq.reshape(rows + 2, w_sz, c)
    # conv1's output only exists for real image rows: at the image
    # edges conv2's halo row is a ZERO pad row, not conv1 applied to
    # the zero-padded edge (the XLA chain pads h1 with zeros)
    zero_q = jnp.zeros((w_sz, c), jnp.int8)
    q2_ref[0, 1:w_sz + 1] = jnp.where(first, zero_q,
                                      q2_ref[0, 1:w_sz + 1])
    q2_ref[rows + 1, 1:w_sz + 1] = jnp.where(
        last, zero_q, q2_ref[rows + 1, 1:w_sz + 1])

    # ---- conv2 + bn2 + residual ----
    _build_q9(q2_ref, q9b_ref, rows, w_sz, c)
    acc2 = jax.lax.dot_general(
        q9b_ref[:], w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * d2_ref[:] + e2_ref[:]
    resid = xs_ref[2:rows + 2, 1:w_sz + 1].astype(jnp.float32)
    o_ref[0] = (y.reshape(rows, w_sz, c) + resid).astype(o_ref.dtype)


def _pick_rows(h: int) -> int | None:
    for r in (8, 6, 10, 5, 4, 12, 3, 2):
        if h % r == 0:
            return r
    return None


def rcu_fusable(h: int, w: int, c: int) -> bool:
    """Shape gate: lane-aligned channels, a workable band split, and
    enough rows for the 2-row halo pattern."""
    return (c % 128 == 0 and h >= 4 and w >= 8
            and _pick_rows(h) is not None)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_rcu(
    x: jnp.ndarray,                 # (N, H, W, C) bf16
    w1q: jnp.ndarray,               # (3, 3, C, C) int8 conv1 kernel
    d1: jnp.ndarray, e1: jnp.ndarray,   # (C,) fp32 affine: s1·sw1·a1, c1
    s1_inv: jnp.ndarray,            # fp32 scalar 1/s_act1
    w2q: jnp.ndarray,               # (3, 3, C, C) int8 conv2 kernel
    d2: jnp.ndarray, e2: jnp.ndarray,
    s2_inv: jnp.ndarray,            # fp32 scalar 1/s_act2
    rows: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out = x + aff2(conv2(q2(relu(aff1(conv1(q1(relu(x))))))))
    with aff_i the folded BN/bias affine and q_i the calibrated int8
    grids. See module docstring; drop-in for the serving
    ResidualConvUnit at eval."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    if rows is None:
        rows = _pick_rows(h)
    assert h % rows == 0 and rows >= 2, (h, rows)
    nb = h // rows

    w1 = w1q.reshape(9 * c, c)       # (ky,kx,ci) -> lane-concat order
    w2 = w2q.reshape(9 * c, c)
    scales = jnp.stack([s1_inv.astype(jnp.float32).reshape(()),
                        s2_inv.astype(jnp.float32).reshape(())])

    xblk = lambda fn: pl.BlockSpec(
        (1, rows, w, c), lambda ni, ri: (ni, fn(ri), 0, 0),
        memory_space=pltpu.VMEM,
    )
    cvec = lambda: pl.BlockSpec((1, c), lambda ni, ri: (0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rcu_kernel, rows=rows),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xblk(lambda ri: jnp.maximum(ri - 1, 0)),
            xblk(lambda ri: ri),
            xblk(lambda ri: jnp.minimum(ri + 1, nb - 1)),
            pl.BlockSpec((9 * c, c), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            cvec(), cvec(), cvec(), cvec(),
        ],
        out_specs=pl.BlockSpec((1, rows, w, c),
                               lambda ni, ri: (ni, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 4, w + 2, c), x.dtype),
            pltpu.VMEM((rows + 4, w + 2, c), jnp.int8),
            pltpu.VMEM(((rows + 2) * w, 9 * c), jnp.int8),
            pltpu.VMEM((rows + 2, w + 2, c), jnp.int8),
            pltpu.VMEM((rows * w, 9 * c), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scales, x, x, x, w1, w2,
      d1.astype(jnp.float32).reshape(1, c),
      e1.astype(jnp.float32).reshape(1, c),
      d2.astype(jnp.float32).reshape(1, c),
      e2.astype(jnp.float32).reshape(1, c))
    return out


def fold_bn_affine(sx, sw, bn_scale, bn_bias, bn_mean, bn_var,
                   conv_bias=None, eps: float = 1e-5):
    """Fold the int8 dequant (sx·sw per channel) and the eval-mode BN
    (or the conv bias when BN is off) into one per-channel affine
    (d, e): y = acc·d + e."""
    sx = sx.astype(jnp.float32)
    sw = sw.astype(jnp.float32)
    if bn_scale is None:
        d = sx * sw
        e = (conv_bias.astype(jnp.float32) if conv_bias is not None
             else jnp.zeros_like(sw))
        return d, e
    a = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + eps)
    c = bn_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32) * a
    d = sx * sw * a
    if conv_bias is not None:
        c = c + conv_bias.astype(jnp.float32) * a
    return d, c
