"""Flash attention over the FLAT fused-qkv layout (TPU Pallas).

Why another attention kernel: on v5e the XLA einsum attention is
HBM-bound on the (B, H, T, T) score matrix (3 passes x 208 MB/block at
the flagship 480-crop size = ~1.06 ms/block), and the stock jax flash
kernel, while 2x faster in isolation, loses its whole win to layout
transitions — producing its (B, H, T, hd) heads-major operands costs
~0.4 ms/block whether via a strided-output einsum or explicit
transposes (round-2 A/B, CLAUDE.md).

This kernel eliminates the layout tax by consuming the qkv projection's
NATIVE output: the flat (N, T, 3D) tensor, viewed as (N, T, 3*H/2, 128)
so every 128-lane column block is exactly TWO heads (head_dim 64). Each
grid step loads one q row-block and the full K/V column block for a
head pair straight from the flat array (free reshape, aligned DMA),
runs two single-pass softmax attentions in VMEM (scores in fp32, never
in HBM), and writes the (bq, 128) result into the flat (N, T, D) output
that the projection matmul consumes directly. Zero transposes anywhere.

Constraints: head_dim == 64 (the LSeg ViT-L/B regime), even head count,
T fits VMEM as one K/V block (~1k tokens; true for 480-crop T=901).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HD = 64  # head_dim this kernel is specialized for (2 heads / 128 lanes)


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale, t_valid, bq):
    q2 = q_ref[0]                     # (bq, 128) — two heads
    k2 = k_ref[0]                     # (T, 128)
    v2 = v_ref[0]

    outs = []
    for h in (0, 1):
        lo = h * _HD
        qh = q2[:, lo: lo + _HD]
        kh = k2[:, lo: lo + _HD]
        vh = v2[:, lo: lo + _HD]
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                      # (bq, T) fp32, VMEM-only
        if s.shape[1] != t_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v2.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # (bq, 64)
        outs.append(o / l)
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _kernel_v2(q_ref, k_ref, v_ref, out_ref, *, scale, t_valid, bq):
    """Stage-separated variant: both heads' QK matmuls first, then both
    softmaxes, then both PVs — independent chains give the Mosaic
    scheduler room to overlap head-0 VPU (exp) with head-1 MXU work.
    exp2 with the log2(e) factor folded into `scale` replaces exp."""
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    s2 = jnp.float32(scale * 1.4426950408889634)  # scale * log2(e)

    ss = []
    for h in (0, 1):
        lo = h * _HD
        s = jax.lax.dot_general(
            q2[:, lo: lo + _HD], k2[:, lo: lo + _HD],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s2
        if s.shape[1] != t_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -jnp.inf)
        ss.append(s)
    ps = []
    for s in ss:
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)  # softmax invariant under base change
        ps.append((p, jnp.sum(p, axis=1, keepdims=True)))
    outs = []
    for h, (p, l) in zip((0, 1), ps):
        lo = h * _HD
        o = jax.lax.dot_general(
            p.astype(v2.dtype), v2[:, lo: lo + _HD],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q",
                              "interpret", "valid_len", "variant"),
)
def flash_attention_flat(
    qkv: jnp.ndarray,   # (N, T, 3*D) — the fused projection's output
    num_heads: int,
    scale: float,
    block_q: int = 256,
    interpret: bool = None,
    valid_len: int = None,
    variant: str = "v1",
) -> jnp.ndarray:       # (N, T, D)
    """`valid_len` masks key/value positions >= valid_len out of the
    softmax — used when the token sequence is padded to a sublane
    multiple so the residual stream's 2D<->3D reshapes are free
    bitcasts (rows % 8 == 0) instead of 0.7 ms tile-repack copies."""
    if interpret is None:
        # off-TPU (CPU test mesh) the Mosaic lowering is unavailable;
        # run the kernel in interpret mode there
        interpret = jax.default_backend() != "tpu"
    n, t, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    assert hd == _HD, (hd, "kernel specialized for head_dim 64")
    assert num_heads % 2 == 0, num_heads
    pairs = num_heads // 2
    bq = min(block_q, t)
    nq = pl.cdiv(t, bq)

    # The last dim is blocked at 128 lanes directly on the flat array:
    # q pair p lives at column block p, k at pairs+p, v at 2*pairs+p.
    grid = (n, pairs, nq)

    kern = _kernel_v2 if variant == "v2" else _kernel
    out = pl.pallas_call(
        functools.partial(kern, scale=scale,
                          t_valid=valid_len or t, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 128),
                         lambda ni, p, qi: (ni, qi, p)),
            pl.BlockSpec((1, t, 128),
                         lambda ni, p, qi: (ni, 0, pairs + p)),
            pl.BlockSpec((1, t, 128),
                         lambda ni, p, qi: (ni, 0, 2 * pairs + p)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128),
                               lambda ni, p, qi: (ni, qi, p)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _pair_softmax_attention(qkv, scale, t_valid, scores_dtype,
                            qk_int8=False, mbias=None, staged=False,
                            use_exp2=False):
    """Shared two-head interior of the fused qkv kernels: per head,
    QK^T -> masked single-pass softmax -> PV, returning the (T, 128)
    pair output in fp32. `scores_dtype` sets the score/softmax compute
    dtype: fp32 (parity-leaning default) or bf16 — the same knob as
    `ViTConfig.attn_scores_dtype` on the XLA path (measured WORSE end
    to end on v5e: the f32->bf16 cast pass costs more than the bf16
    VPU chain saves; kept as evidence/knob). `qk_int8` re-quantizes
    q/k per row in VMEM and runs QK^T on the int8 MXU at 2x the bf16
    rate; the rank-1 dequant (sq_i * sk_j) folds into the score scale
    pass. `qkv` is either the (T, 384) pair tensor or the
    (q2, k2, v2) tuple of (T, 128) slices (the per-slice-dequant
    kernels pass the tuple so no VMEM concat ever happens).

    Two VPU-pass eliminations over the (T, T) score matrix (the
    'lean' kernel variant):
    - `scale == 1.0` skips the score-scale multiply entirely — callers
      fold the softmax scale into the q dequant scales host-side
      (softmax(scale*(q.k)) == softmax((scale*q).k) exactly);
    - `mbias` (a (T,) fp32 lane vector: 0 for valid key columns, -inf
      for sublane padding) replaces the per-head iota/compare/select
      key mask with ONE broadcast add, computed once per block into a
      VMEM scratch instead of 2*pairs times per block.

    `staged=True` phase-separates the two heads (both QK matmuls, then
    both softmax chains, then both PV matmuls) so the VLIW scheduler
    sees head 1's MXU work independent of head 0's VPU softmax and can
    overlap them — the serial per-head chain leaves the MXU idle
    through every softmax. Costs a second live (T, T) score matrix in
    VMEM."""
    if isinstance(qkv, tuple):
        q2, k2, v2 = qkv
    else:
        q2 = qkv[:, 0:128]
        k2 = qkv[:, 128:256]
        v2 = qkv[:, 256:384]

    def _scores(h):
        lo = h * _HD
        qh = q2[:, lo: lo + _HD]
        kh = k2[:, lo: lo + _HD]
        if qk_int8:
            qf = qh.astype(jnp.float32)
            sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=1,
                                     keepdims=True), 1e-8) / 127.0
            qi = jnp.clip(jnp.round(qf / sq), -127, 127
                          ).astype(jnp.int8)
            kf = kh.astype(jnp.float32)
            sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=1,
                                     keepdims=True), 1e-8) / 127.0
            ki = jnp.clip(jnp.round(kf / sk), -127, 127
                          ).astype(jnp.int8)
            s = jax.lax.dot_general(
                qi, ki, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ((sq * scale)
                                     * sk.reshape(1, -1))
        else:
            # MXU accumulates fp32 (Mosaic requires a 32-bit acc); the
            # scores then drop to `scores_dtype` for the VPU softmax
            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(scores_dtype)
            if scale != 1.0:
                s = s * jnp.asarray(scale, scores_dtype)
        if mbias is not None:
            s = s + mbias.astype(s.dtype)
        elif s.shape[1] != t_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s,
                          jnp.asarray(-jnp.inf, s.dtype))
        return s

    def _softmax(s):
        m = jnp.max(s, axis=1, keepdims=True)
        # use_exp2: caller folded log2(e) into the scores (via the
        # lean q-scale fold), so exp2(s - m) == exp of the unfolded
        # scores exactly in real math — skips exp's internal
        # multiply-by-log2e per element on the VPU transcendental path
        p = jnp.exp2(s - m) if use_exp2 else jnp.exp(s - m)
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        return p, l

    def _pv(p, l, h):
        lo = h * _HD
        o = jax.lax.dot_general(
            p.astype(v2.dtype), v2[:, lo: lo + _HD],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return o / l

    if staged:
        ss = [_scores(h) for h in (0, 1)]
        pls = [_softmax(s) for s in ss]
        outs = [_pv(p, l, h) for h, (p, l) in enumerate(pls)]
    else:
        outs = [_pv(*_softmax(_scores(h)), h) for h in (0, 1)]
    return jnp.concatenate(outs, axis=1)


def _dequant_qkv_parts(xq, sx, w_refs, sw_ref, b_ref, row_off=0,
                       lane_off=None):
    """Shared int8-matmul + dequant interior of the fused qkv kernels:
    per q/k/v slice i, xq(T,D)i8 @ w(D,128)i8 on the int8 MXU, then
    `acc * sx * sw_row_i + b_row_i` in fp32 -> bf16.

    `sw_ref`/`b_ref` are (3, 128) blocks — ONE SUBLANE ROW PER SLICE
    (`row_off` shifts the row base for kernels whose block carries
    more than one pair's rows). Mosaic toolchain constraint (Aug 2026
    drift, BENCH_r04 / round-5 fix, validated by
    scripts/mosaic_probe.py): broadcasting a LANE-OFFSET slice of a
    one-row block (`sw[0][:, 128:256]`, layout lane offset 128)
    against the (T, 128) accumulator is rejected with 'Invalid input
    layout'; whole-sublane-row indexing (`sw_ref[i]`, a (128,) lane
    vector) compiles.

    `lane_off` selects a 128-lane column slice of WIDER (D, 128k)
    weight blocks (the quad kernel feeds (D, 256) blocks covering two
    pairs) — a whole-lane-tile slice, the same construct as the
    (T, 384) qkv slicing in `_pair_softmax_attention`."""
    parts = []
    for i, w_ref in enumerate(w_refs):
        w = w_ref[:]
        if lane_off is not None:
            w = w[:, lane_off: lane_off + 128]
        acc = jax.lax.dot_general(
            xq, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        parts.append((acc.astype(jnp.float32) * sx
                      * sw_ref[row_off + i] + b_ref[row_off + i]
                      ).astype(jnp.bfloat16))
    return tuple(parts)


def _qkv_rows(sw, bias, pairs):
    """Host-side rearrangement of the (3D,) qkv output-channel scales
    and bias into (8*pairs, 128): rows ordered [q_p, k_p, v_p, 0...]
    per pair p (padded from 3 to 8 rows — the block sublane dim must
    be divisible by 8), so the kernel's (8, 128) block at pair-block
    index p holds its q/k/v rows as whole sublanes (see
    `_dequant_qkv_parts`)."""
    def rows(v):
        v3 = v.reshape(3, pairs, 128).transpose(1, 0, 2)  # (pairs,3,128)
        v8 = jnp.concatenate(
            [v3, jnp.zeros((pairs, 5, 128), v3.dtype)], axis=1)
        return v8.reshape(8 * pairs, 128).astype(jnp.float32)
    return rows(sw), rows(bias)


def _qkv_rows_spec():
    return pl.BlockSpec((8, 128), lambda ni, p: (p, 0))


def _kernel_qkv(xq_ref, sx_ref, wq_ref, wk_ref, wv_ref, sw_ref, b_ref,
                out_ref, *, scale, t_valid):
    """Fused int8 qkv-projection + two-head flash attention.

    Per (batch, head-pair) grid step: the int8 LN output (T, D) hits
    the MXU against this pair's q/k/v weight column slices (three
    (D, 128) BlockSpec views of the RAW (D, 3D) param — no host-side
    weight rearrangement; see `_kernel_ln_qkv_q8` doc), dequantizes in
    VMEM, and runs the same single-pass fp32 softmax as `_kernel`. The
    (N, T, 3D) qkv tensor never exists in HBM (saves its write + read,
    ~88 MB/block at the flagship shape)."""
    parts = _dequant_qkv_parts(xq_ref[0], sx_ref[0],
                               (wq_ref, wk_ref, wv_ref), sw_ref, b_ref)
    out_ref[0] = _pair_softmax_attention(
        parts, scale, t_valid, jnp.float32).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret",
                              "valid_len"),
)
def flash_attention_qkv_fused(
    xq: jnp.ndarray,     # (N, T, D) int8 — per-row quantized LN output
    sx: jnp.ndarray,     # (N, T, 1) fp32 row scales (amax/127)
    wq: jnp.ndarray,     # (D, 3D) int8 pre-quantized qkv kernel
    sw: jnp.ndarray,     # (3D,) fp32 per-output-channel scales
    bias: jnp.ndarray,   # (3D,) fp32
    num_heads: int,
    scale: float,
    interpret: bool = None,
    valid_len: int = None,
) -> jnp.ndarray:        # (N, T, D) bf16
    """Int8 qkv projection fused INTO the flat flash-attention kernel.

    Each grid step loads only its pair's three 128-column weight
    slices straight from the raw (D, 3D) param (0.4 MB total); the x
    block's index map depends only on the batch coordinate, so Mosaic
    keeps it VMEM-resident across the pair-minor grid steps (one HBM
    read of x per image)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = xq.shape
    hd = d // num_heads
    assert hd == _HD and num_heads % 2 == 0, (hd, num_heads)
    pairs = num_heads // 2

    # scales/bias (tiny) host-rearranged into per-pair SUBLANE ROWS
    # (`_qkv_rows` doc); the WEIGHT stays in its raw (D, 3D) layout,
    # fed via three per-pair column BlockSpecs (q at col p, k at
    # pairs+p, v at 2*pairs+p, 128-lane units) — the former
    # (pairs, D, 384) regroup materialized as two full-weight relayout
    # copies per block.
    sw3, b3 = _qkv_rows(sw, bias, pairs)

    def wcol(off):
        return pl.BlockSpec((d, 128), lambda ni, p: (0, off + p))

    grid = (n, pairs)
    out = pl.pallas_call(
        functools.partial(_kernel_qkv, scale=scale,
                          t_valid=valid_len or t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, t, 1), lambda ni, p: (ni, 0, 0)),
            wcol(0), wcol(pairs), wcol(2 * pairs),
            _qkv_rows_spec(), _qkv_rows_spec(),
        ],
        out_specs=pl.BlockSpec((1, t, 128), lambda ni, p: (ni, 0, p)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, sx.astype(jnp.float32), wq, wq, wq, sw3, b3)
    return out


def _kernel_qkvp(xq_ref, sx_ref, w_ref, sw_ref, b_ref, wp_ref, sp_ref,
                 bp_ref, res_ref, out_ref, acc_ref,
                 *, scale, t_valid, pairs):
    """_kernel_qkv + the OUTPUT projection folded in: each pair's
    attention result immediately matmuls its row-slice of the proj
    weight (int8), and the (T, D) partial sums accumulate in a VMEM
    fp32 scratch across the pair-minor grid steps. bias + residual are
    added at the first step; the bf16 block output is written at the
    last. The attention output tensor and its requantized int8 copy
    never exist in HBM."""
    p_idx = pl.program_id(1)
    xq = xq_ref[0]
    sx = sx_ref[0]

    acc = jax.lax.dot_general(
        xq, w_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = (acc.astype(jnp.float32) * sx * sw_ref[0]
           + b_ref[0]).astype(jnp.bfloat16)
    q2 = qkv[:, 0:128]
    k2 = qkv[:, 128:256]
    v2 = qkv[:, 256:384]

    outs = []
    for h in (0, 1):
        lo = h * _HD
        s = jax.lax.dot_general(
            q2[:, lo: lo + _HD], k2[:, lo: lo + _HD],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if s.shape[1] != t_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v2.dtype), v2[:, lo: lo + _HD],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
    att = jnp.concatenate(outs, axis=1)          # (T, 128) fp32

    # per-row int8 requantize of this pair's slice, then its partial
    # projection: rows of Wproj [p*128:(p+1)*128] share the global
    # per-output-column scale, so partials dequantize independently
    amax = jnp.max(jnp.abs(att), axis=1, keepdims=True)
    sa = jnp.maximum(amax, 1e-8) / 127.0
    aq = jnp.clip(jnp.round(att / sa), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        aq, wp_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sa * sp_ref[0]       # (T, D) fp32

    @pl.when(p_idx == 0)
    def _init():
        acc_ref[:] = (part + bp_ref[0]
                      + res_ref[0].astype(jnp.float32))

    @pl.when(p_idx > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(p_idx == pairs - 1)
    def _emit():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret",
                              "valid_len"),
)
def flash_attention_qkvp_fused(
    xq: jnp.ndarray,     # (N, T, D) int8 — per-row quantized LN output
    sx: jnp.ndarray,     # (N, T, 1) fp32 row scales
    wq: jnp.ndarray,     # (D, 3D) int8 qkv kernel
    sw: jnp.ndarray,     # (3D,) fp32
    bias: jnp.ndarray,   # (3D,) fp32
    wp: jnp.ndarray,     # (D, D) int8 proj kernel
    sp: jnp.ndarray,     # (D,) fp32 proj col scales
    bp: jnp.ndarray,     # (D,) fp32 proj bias
    resid: jnp.ndarray,  # (N, T, D) bf16 residual stream
    num_heads: int,
    scale: float,
    interpret: bool = None,
    valid_len: int = None,
) -> jnp.ndarray:        # (N, T, D) bf16: resid + proj(attn(qkv(x)))
    """The whole attention half-block (int8 qkv matmul -> flash
    attention -> int8 output projection -> bias -> residual add) as one
    kernel. See `_kernel_qkvp`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = xq.shape
    hd = d // num_heads
    assert hd == _HD and num_heads % 2 == 0, (hd, num_heads)
    pairs = num_heads // 2

    w3 = wq.reshape(d, 3, pairs, 128).transpose(2, 0, 1, 3)
    w3 = w3.reshape(pairs, d, 384)
    sw3 = sw.reshape(3, pairs, 128).transpose(1, 0, 2).reshape(
        pairs, 1, 384)
    b3 = bias.reshape(3, pairs, 128).transpose(1, 0, 2).reshape(
        pairs, 1, 384)
    wp3 = wp.reshape(pairs, 128, d)

    grid = (n, pairs)
    out = pl.pallas_call(
        functools.partial(_kernel_qkvp, scale=scale,
                          t_valid=valid_len or t, pairs=pairs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, t, 1), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, d, 384), lambda ni, p: (p, 0, 0)),
            pl.BlockSpec((1, 1, 384), lambda ni, p: (p, 0, 0)),
            pl.BlockSpec((1, 1, 384), lambda ni, p: (p, 0, 0)),
            pl.BlockSpec((1, 128, d), lambda ni, p: (p, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda ni, p: (0, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda ni, p: (0, 0, 0)),
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, sx.astype(jnp.float32), w3, sw3.astype(jnp.float32),
      b3.astype(jnp.float32), wp3,
      sp.astype(jnp.float32).reshape(1, 1, d),
      bp.astype(jnp.float32).reshape(1, 1, d), resid)
    return out


# ---------------------------------------------------------------------
# Training support: custom VJP for the flat flash kernel.
#
# The reference trains its ViT with cuDNN attention; the XLA bwd here
# materializes the (N, H, T, T) score/probability tensors in HBM three
# more times. This backward kernel recomputes S = scale*QK^T per
# (image, head-pair) grid step entirely in VMEM (T<=~1k fits: the
# (T,T) fp32 score block is 3.3 MB at the 480-crop T=904) and emits
# dQ/dK/dV without any (T,T) HBM traffic. Recomputing the softmax
# stats (row max / sum) costs one extra VPU reduction and saves
# persisting any per-row stats from the forward.
#
# Gradient correctness under sublane padding (valid_len): pad columns
# get -inf scores -> P[:, pad] = 0 -> dV[pad] = dK[pad] = 0 exactly;
# pad-row dO is zero (taps are sliced before any loss) so dQ[pad] = 0.
# ---------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, t_valid):
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]      # (T, 128) bf16
    o2, do2 = o_ref[0], do_ref[0]

    dqs, dks, dvs = [], [], []
    for h in (0, 1):
        lo = h * _HD
        qh = q2[:, lo: lo + _HD]
        kh = k2[:, lo: lo + _HD]
        vh = v2[:, lo: lo + _HD]
        oh = o2[:, lo: lo + _HD].astype(jnp.float32)
        doh = do2[:, lo: lo + _HD].astype(jnp.float32)

        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                   # (T, T) fp32
        if s.shape[1] != t_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        pn = p / jnp.sum(p, axis=1, keepdims=True)  # (T, T) fp32

        pnb = pn.astype(v2.dtype)
        dv = jax.lax.dot_general(                   # P^T dO: (T, 64)
            pnb, doh.astype(v2.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(                   # dO V^T: (T, T)
            doh.astype(v2.dtype), vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_row = jnp.sum(doh * oh, axis=1, keepdims=True)  # (T, 1)
        ds = (pn * (dp - d_row)).astype(v2.dtype)   # (T, T)
        dq = jax.lax.dot_general(                   # dS K * scale
            ds, kh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(                   # dS^T Q * scale
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _flash_flat_bwd_impl(qkv, out, do, num_heads, scale, valid_len,
                         interpret):
    n, t, d3 = qkv.shape
    d = d3 // 3
    pairs = num_heads // 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    col = lambda off: pl.BlockSpec(
        (1, t, 128), lambda ni, p: (ni, 0, off + p))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          t_valid=valid_len or t),
        grid=(n, pairs),
        in_specs=[col(0), col(pairs), col(2 * pairs),
                  pl.BlockSpec((1, t, 128), lambda ni, p: (ni, 0, p)),
                  pl.BlockSpec((1, t, 128), lambda ni, p: (ni, 0, p))],
        out_specs=[pl.BlockSpec((1, t, 128), lambda ni, p: (ni, 0, p))
                   ] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, t, d), qkv.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, out, do)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def flash_attention_flat_vjp(qkv, num_heads, scale, block_q=256,
                             interpret=None, valid_len=None,
                             variant="v1"):
    """flash_attention_flat with a Pallas backward — drop-in for the
    forward-only kernel wherever gradients may flow (training with
    attn_impl='flashflat'). Inference cost is identical (the residual
    save is DCE'd outside AD)."""
    return flash_attention_flat(qkv, num_heads, scale, block_q,
                                interpret, valid_len, variant)


def _flash_flat_fwd(qkv, num_heads, scale, block_q, interpret,
                    valid_len, variant):
    out = flash_attention_flat(qkv, num_heads, scale, block_q,
                               interpret, valid_len, variant)
    return out, (qkv, out)


def _flash_flat_bwd(num_heads, scale, block_q, interpret, valid_len,
                    variant, res, do):
    qkv, out = res
    dqkv = _flash_flat_bwd_impl(qkv, out, do.astype(qkv.dtype),
                                num_heads, scale, valid_len, interpret)
    return (dqkv,)


flash_attention_flat_vjp.defvjp(_flash_flat_fwd, _flash_flat_bwd)


def _kernel_ln_qkv(x_ref, g_ref, bln_ref, wq_ref, wk_ref, wv_ref,
                   sw_ref, b_ref,
                   out_ref, xq_ref, sx_ref, *, scale, t_valid, eps):
    """_kernel_qkv with the pre-attention LayerNorm + per-row int8
    quantize pulled INSIDE: at pair step 0 the raw bf16 residual-stream
    block (T, D) is normalized and quantized once into VMEM scratches;
    the 7 later pair steps reuse them. The LN output and its int8 copy
    never exist in HBM, and no standalone LayerNorm op remains in the
    scan body for XLA to peel (the 4x0.33 ms first-iteration LN
    fusions, CLAUDE.md round-2 profile)."""
    p_idx = pl.program_id(1)

    @pl.when(p_idx == 0)
    def _ln_quant():
        xf = x_ref[0].astype(jnp.float32)              # (T, D)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + bln_ref[0]
        amax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
        sxr = jnp.maximum(amax, 1e-8) / 127.0
        sx_ref[:] = sxr
        xq_ref[:] = jnp.clip(jnp.round(xn / sxr),
                             -127, 127).astype(jnp.int8)

    parts = _dequant_qkv_parts(xq_ref[:], sx_ref[:],
                               (wq_ref, wk_ref, wv_ref), sw_ref, b_ref)
    out_ref[0] = _pair_softmax_attention(
        parts, scale, t_valid, jnp.float32).astype(out_ref.dtype)


def _kernel_ln_qkv_q8(x_ref, g_ref, bln_ref, wq_ref, wk_ref, wv_ref,
                      sw_ref, b_ref,
                      oq_ref, os_ref, xq_ref, sx_ref, obuf_ref, mb_ref,
                      *, scale, t_valid, eps, pairs,
                      scores_dtype=jnp.float32, qk_int8=False,
                      mask_bias=False, staged=False, use_exp2=False,
                      pairs_per_step=1):
    """`_kernel_ln_qkv` emitting the attention output PRE-QUANTIZED for
    the int8 output projection: each pair's (T, 128) result accumulates
    in a bf16 VMEM scratch; at the last pair step the full (T, D) block
    is per-row quantized once (same fp32 amax/round/clip sequence as
    `ops.quant.quantize_rows`, so the downstream proj matmul sees
    bit-identical operands). The bf16 attention output and its int8
    copy never exist in HBM — only (T, D) int8 + (T, 1) scales leave
    the kernel, replacing the external quantize pass's full read+write
    of the bf16 tensor per block.

    The qkv weight arrives as the RAW (D, 3D) param via THREE column
    BlockSpecs (this pair's q/k/v 128-lane slices) instead of a
    host-side (pairs, D, 384) rearrangement — that transpose+reshape
    materialized as two full-weight relayout copies per block (2 x
    3.1 MB x 24 = 151 MB/step) plus whole stacked-param copies.
    Splitting the dot's N dim into three 128-column dots is
    bit-identical (output columns accumulate independently)."""
    p_idx = pl.program_id(1)
    t = xq_ref.shape[0]
    use_mb = mask_bias and t != t_valid

    @pl.when(p_idx == 0)
    def _ln_quant():
        xf = x_ref[0].astype(jnp.float32)              # (T, D)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + bln_ref[0]
        amax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
        sxr = jnp.maximum(amax, 1e-8) / 127.0
        sx_ref[:] = sxr
        xq_ref[:] = jnp.clip(jnp.round(xn / sxr),
                             -127, 127).astype(jnp.int8)
        if use_mb:
            # key-mask bias row, built ONCE per block (the per-head
            # softmax adds it instead of an iota/compare/select pass)
            col = jax.lax.broadcasted_iota(jnp.int32, mb_ref.shape, 1)
            mb_ref[:] = jnp.where(col < t_valid, 0.0, -jnp.inf)

    # pairs_per_step > 1 ('quad' variant): this grid step's weight
    # blocks are (D, 128*pps) covering pps consecutive pairs and its
    # scale/bias block carries pps row groups; the pair interior runs
    # pps times per step, halving the grid-step count (fewer per-step
    # fixed costs; identical arithmetic in identical order)
    for j in range(pairs_per_step):
        parts = _dequant_qkv_parts(
            xq_ref[:], sx_ref[:], (wq_ref, wk_ref, wv_ref),
            sw_ref, b_ref, row_off=8 * j,
            lane_off=128 * j if pairs_per_step > 1 else None)
        pair = p_idx * pairs_per_step + j
        obuf_ref[:, pl.ds(pair * 128, 128)] = _pair_softmax_attention(
            parts, scale, t_valid, scores_dtype,
            qk_int8=qk_int8, staged=staged, use_exp2=use_exp2,
            mbias=mb_ref[0] if use_mb else None).astype(jnp.bfloat16)

    @pl.when(p_idx == pairs // pairs_per_step - 1)
    def _emit_q8():
        of = obuf_ref[:].astype(jnp.float32)           # (T, D)
        amax = jnp.max(jnp.abs(of), axis=1, keepdims=True)
        so = jnp.maximum(amax, 1e-8) / 127.0
        os_ref[0] = so
        oq_ref[0] = jnp.clip(jnp.round(of / so),
                             -127, 127).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret",
                              "valid_len", "eps", "scores_dtype",
                              "qk_int8", "lean", "staged", "exp2",
                              "quad", "pairs_per_step"),
)
def flash_attention_ln_qkv_fused_q8(
    x: jnp.ndarray,       # (N, T, D) bf16 — RAW residual stream
    ln_scale: jnp.ndarray,  # (D,) fp32 LayerNorm scale
    ln_bias: jnp.ndarray,   # (D,) fp32 LayerNorm bias
    wq: jnp.ndarray,      # (D, 3D) int8 pre-quantized qkv kernel
    sw: jnp.ndarray,      # (3D,) fp32 per-output-channel scales
    bias: jnp.ndarray,    # (3D,) fp32
    num_heads: int,
    scale: float,
    interpret: bool = None,
    valid_len: int = None,
    eps: float = 1e-6,
    scores_dtype=jnp.float32,
    qk_int8: bool = False,
    lean: bool = False,
    staged: bool = False,
    exp2: bool = False,
    quad: bool = False,
    pairs_per_step: int = None,
):                        # -> ((N, T, D) int8, (N, T, 1) fp32)
    """`flash_attention_ln_qkv_fused` emitting (int8 output, row
    scales) for the static-int8 output projection (`_kernel_ln_qkv_q8`).
    `scores_dtype=bf16` mirrors `ViTConfig.attn_scores_dtype` (the fast
    config's XLA-path precision) inside the kernel.

    `lean=True` removes two full VPU passes over each (T, T) score
    matrix (see `_pair_softmax_attention`): the softmax scale is folded
    into the q output-channel dequant scales + bias host-side (exact up
    to one fp32 reassociation in the dequant multiply before the bf16
    cast), and the pad-key mask becomes a precomputed bias-row add."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = x.shape
    hd = d // num_heads
    assert hd == _HD and num_heads % 2 == 0, (hd, num_heads)
    pairs = num_heads // 2

    if exp2:
        lean = True  # the log2(e) fold rides the lean scale fold
    mask_bias = False
    if lean:
        # fold softmax scale into the q channels (cols [0, d) of the
        # (D, 3D) qkv projection): softmax((scale*q).k) == the scaled
        # softmax, so the kernel's per-score multiply disappears.
        # exp2 additionally folds log2(e) so the kernel's exp becomes
        # a bare exp2 (exp(x) == exp2(x*log2(e)))
        sf = jnp.float32(scale * (1.4426950408889634 if exp2 else 1.0))
        seg = jnp.concatenate([jnp.full((d,), sf, jnp.float32),
                               jnp.ones((2 * d,), jnp.float32)])
        sw = sw.astype(jnp.float32) * seg
        bias = bias.astype(jnp.float32) * seg
        scale = 1.0
        mask_bias = True

    # scales/bias are tiny (3D fp32): host-rearranged into per-pair
    # sublane rows (`_qkv_rows` doc). The WEIGHT stays in its raw
    # (D, 3D) layout and is fed through three per-pair column
    # BlockSpecs (q at col p, k at pairs+p, v at 2*pairs+p, in
    # 128-lane units) — see _kernel doc. `quad` processes TWO pairs
    # per grid step ((D, 256) weight blocks, 16-row scale blocks):
    # half the grid steps, identical arithmetic. `pairs_per_step`
    # generalizes (2 == quad; `pairs` == one grid step per image).
    pps = pairs_per_step or (2 if quad else 1)
    assert pairs % pps == 0, (pairs, pps)
    steps = pairs // pps
    sw3, b3 = _qkv_rows(sw, bias, pairs)

    def wcol(off):
        return pl.BlockSpec((d, 128 * pps), lambda ni, p: (0, off + p))

    oq, os = pl.pallas_call(
        functools.partial(_kernel_ln_qkv_q8, scale=scale,
                          t_valid=valid_len or t, eps=eps,
                          pairs=pairs, scores_dtype=scores_dtype,
                          qk_int8=qk_int8, mask_bias=mask_bias,
                          staged=staged, use_exp2=exp2,
                          pairs_per_step=pps),
        grid=(n, steps),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, d), lambda ni, p: (0, 0)),
            pl.BlockSpec((1, d), lambda ni, p: (0, 0)),
            wcol(0), wcol(steps), wcol(2 * steps),
            pl.BlockSpec((8 * pps, 128), lambda ni, p: (p, 0)),
            pl.BlockSpec((8 * pps, 128), lambda ni, p: (p, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, t, 1), lambda ni, p: (ni, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), jnp.int8),
            jax.ShapeDtypeStruct((n, t, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.int8),
            pltpu.VMEM((t, 1), jnp.float32),
            pltpu.VMEM((t, d), jnp.bfloat16),
            pltpu.VMEM((8, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The Aug-2026 toolchain allocates ~0.75 MB more stack for
            # this kernel than the 16 MB default scoped limit (it fit
            # before the drift); v5e VMEM is 128 MB — raise the scoped
            # cap rather than shrink the single-block softmax. The
            # staged interior keeps a second (T, T) fp32 score matrix
            # live (~6.5 MB more at the flagship shape); multi-pair
            # steps cost ~6.5 MB PER PAIR IN THE STEP on top — Mosaic's
            # stack allocator does not reuse the unrolled pair
            # interiors' score buffers across iterations (measured:
            # pps=8 allocates 67.4 MB at the flagship shape). v5e has
            # 128 MB; cap accordingly.
            vmem_limit_bytes=(96 if pps > 4 else
                              56 if pps > 2 else
                              32 if (staged or pps > 1)
                              else 24) * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32).reshape(1, d),
      ln_bias.astype(jnp.float32).reshape(1, d),
      wq, wq, wq, sw3, b3)
    return oq, os


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret",
                              "valid_len", "eps"),
)
def flash_attention_ln_qkv_fused(
    x: jnp.ndarray,       # (N, T, D) bf16 — RAW residual stream
    ln_scale: jnp.ndarray,  # (D,) fp32 LayerNorm scale
    ln_bias: jnp.ndarray,   # (D,) fp32 LayerNorm bias
    wq: jnp.ndarray,      # (D, 3D) int8 pre-quantized qkv kernel
    sw: jnp.ndarray,      # (3D,) fp32 per-output-channel scales
    bias: jnp.ndarray,    # (3D,) fp32
    num_heads: int,
    scale: float,
    interpret: bool = None,
    valid_len: int = None,
    eps: float = 1e-6,
) -> jnp.ndarray:         # (N, T, D) bf16
    """LayerNorm + per-row int8 quantize + int8 qkv projection + flash
    attention in one kernel (see `_kernel_ln_qkv`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, d = x.shape
    hd = d // num_heads
    assert hd == _HD and num_heads % 2 == 0, (hd, num_heads)
    pairs = num_heads // 2

    sw3, b3 = _qkv_rows(sw, bias, pairs)

    def wcol(off):
        return pl.BlockSpec((d, 128), lambda ni, p: (0, off + p))

    out = pl.pallas_call(
        functools.partial(_kernel_ln_qkv, scale=scale,
                          t_valid=valid_len or t, eps=eps),
        grid=(n, pairs),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda ni, p: (ni, 0, 0)),
            pl.BlockSpec((1, d), lambda ni, p: (0, 0)),
            pl.BlockSpec((1, d), lambda ni, p: (0, 0)),
            wcol(0), wcol(pairs), wcol(2 * pairs),
            _qkv_rows_spec(), _qkv_rows_spec(),
        ],
        out_specs=pl.BlockSpec((1, t, 128), lambda ni, p: (ni, 0, p)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.int8),
            pltpu.VMEM((t, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=24 * 1024 * 1024,  # see q8 variant note
        ),
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32).reshape(1, d),
      ln_bias.astype(jnp.float32).reshape(1, d),
      wq, wq, wq, sw3, b3)
    return out
