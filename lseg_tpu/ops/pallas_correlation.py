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
                  k_out, normalize=True):
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
    o_ref[:] = ((lo * inv) if normalize else lo
                ).astype(o_ref.dtype)[:, :k_out]


def _head1_up_argmax_kernel(
    ho_ref, hw_ref,       # SMEM: (2H,) int32 row floor, (2H,) fp32 frac
    xp_ref, xc_ref, xn_ref,  # (1, R, W, C) int8 prev/center/next blocks
    w_ref, sc_ref, b_ref, t_ref, wi_ref,
    o_ref,                # (1, 2R, 2W) int32 predictions
    lo_ref,               # VMEM scratch (rp2*W, K) bf16 logit rows
    hb_ref,               # VMEM scratch (2R, W, K) bf16 H-blended rows
    ub_ref,               # VMEM scratch (2R, 2W, K) bf16 upsampled rows
    *, rows, eps,
):
    """Fused int8 head1 1x1 conv + deferred-norm correlation + x2
    align-corners bilinear upsample + argmax for one (image, row-band)
    grid step. The (M, E) pixel-embedding map, the (N, H, W, K)
    half-res logit map AND the (N, 2H, 2W, K) upsampled logit map never
    exist in HBM — the XLA tail costs ~2.2 ms/batch-8 in relayout
    copies + interp matmul + a 553 MB recompute-fused argmax read at
    the flagship shape; here only (N, 2H, 2W) int32 leaves the kernel.

    H-interp needs source rows [r0-1, r0+R]; the one-row halos come
    from re-reading the neighbor blocks (clamped index maps) and
    recomputing their edge embeddings ((R+2)/R compute overhead).

    The interior is phase-separated so each unit stays busy instead of
    ping-ponging per output row (the first cut — blend + small matmul
    + argmax serialised per row — measured 6.3 ms vs the 3.65 ms XLA
    tail; a single 3-D blend dot_general is not lowerable, Mosaic
    reshape limits): all 2R dynamic-slice H-blends (pure VPU) fill a
    scratch, then 2R static W-interp matmuls queue back-to-back on the
    MXU, then ONE vectorized lane-argmax covers the band.

    MEASURED DEAD END (interleaved A/B, scripts/headtail_ab.py,
    flagship shape N=8 H=W=240 C=256 E=512 K=150): best form 5.9 ms
    vs the XLA tail's 3.6 — the three serial phases (per-row embed
    matmuls incl. 25% halo recompute, dynamic-slice VPU blends, 2R
    small W-interp matmuls) lose to XLA's overlapped streams, the
    same pattern as flashqp/mlpf. rows=16/24 OOM the 16 MB scoped
    VMEM; per-row 2-D argmax 8.2 ms. Kept as tested infrastructure
    (non-default); the serving tail stays head1_correlate_fused +
    XLA upsample/argmax."""
    r_blk = pl.program_id(1)
    rp2 = rows + 2
    _, _, w_sz, c = xc_ref.shape
    k = t_ref.shape[0]

    # ---- embeddings + deferred-norm logits for rows r0-1 .. r0+R,
    # chunked per source row to bound the fp32 value intermediates
    # (full-band acc+e are 2x 4.9 MB and blow the 16 MB scoped-VMEM
    # stack; per-row they are 2x 0.5 MB and the static loop pipelines)
    for r in range(rp2):
        if r == 0:
            xrow = xp_ref[0, rows - 1]
        elif r == rp2 - 1:
            xrow = xn_ref[0, 0]
        else:
            xrow = xc_ref[0, r - 1]        # (W, C) int8
        acc = jax.lax.dot_general(
            xrow, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        e = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(e * e, axis=1, keepdims=True), eps))
        lo_ref[r * w_sz:(r + 1) * w_sz] = (jax.lax.dot_general(
            e.astype(jnp.bfloat16), t_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv).astype(jnp.bfloat16)      # (W, K)

    # ---- phase 1: H-blend every output row (VPU, dynamic slices) ----
    for j in range(2 * rows):
        jo = 2 * rows * r_blk + j
        rel = ho_ref[jo] - (r_blk * rows - 1)
        f = hw_ref[jo]
        pair = lo_ref[pl.ds(rel * w_sz, 2 * w_sz)]   # 2 source rows
        hb_ref[j] = (
            pair[:w_sz].astype(jnp.float32) * (1.0 - f)
            + pair[w_sz:].astype(jnp.float32) * f
        ).astype(jnp.bfloat16)
    # ---- phase 2: W-interp, static MXU matmuls back-to-back ----
    wi = wi_ref[:]                         # (2W, W) bf16
    for j in range(2 * rows):
        ub_ref[j] = jax.lax.dot_general(
            wi, hb_ref[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)             # (2W, K)
    # ---- phase 3: one 3-D lane argmax over the whole band (the
    # manual max/where/min formulation hits a Mosaic i1-relayout
    # limit; Mosaic argmax needs an f32 input; a per-row 2-D argmax
    # loop measured 8.2 vs 5.9 ms — keep the single 3-D reduce) ----
    o_ref[0] = jnp.argmax(
        ub_ref[:].astype(jnp.float32), axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("logit_scale", "rows", "interpret")
)
def head1_correlate_upsample_argmax(
    xq: jnp.ndarray,      # (N, H, W, C) int8 — quantized path1
    sx: jnp.ndarray,      # fp32 scalar activation scale (amax/127)
    w1q: jnp.ndarray,     # (1, 1, C, E) int8 head1 kernel
    s1: jnp.ndarray,      # (E,) fp32 per-channel weight scales
    b1: jnp.ndarray,      # (E,) fp32 head1 bias
    text_features: jnp.ndarray,  # (K, E) fp32 raw text features
    logit_scale: float = 1.0 / 0.07,
    rows: int = 8,
    interpret: bool = None,
) -> jnp.ndarray:         # (N, 2H, 2W) int32 class predictions
    """Single-scale serving head: argmax over K of the x2-upsampled
    deferred-norm logits (reference semantics: lseg_net.py:185-205 +
    the x2 align_corners=True output head lseg_net.py:219-221, argmax
    as in lseg_app.py:357), all inside one Pallas kernel."""
    import numpy as np

    from lseg_tpu.ops.resize import _interp_matrix

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = xq.shape
    e_dim = w1q.shape[-1]
    k = text_features.shape[0]
    assert h % rows == 0, (h, rows)
    nb = h // rows

    t = text_features.astype(jnp.float32)
    tn = t * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))
    tn = (logit_scale * tn).astype(jnp.bfloat16)
    sc = (sx.astype(jnp.float32).reshape(1, 1)
          * s1.astype(jnp.float32).reshape(1, e_dim))

    # exact torch bilinear weights (ops/resize._interp_matrix): the H
    # axis as (floor_row, frac) pairs for the in-kernel two-row blend,
    # the W axis as a dense (2W, W) interp operator for the MXU
    ah = _interp_matrix(h, 2 * h, align_corners=True)
    ho = np.argmax(ah > 0, axis=1).astype(np.int32)  # floor row
    hw_frac = (1.0 - ah[np.arange(2 * h), ho]).astype(np.float32)
    rp2 = rows + 2
    wi = jnp.asarray(
        _interp_matrix(w, 2 * w, align_corners=True), jnp.bfloat16)

    xblk = lambda fn: pl.BlockSpec(
        (1, rows, w, c),
        lambda ni, ri: (ni, fn(ri), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_head1_up_argmax_kernel, rows=rows, eps=1e-24),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ho
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hw
            xblk(lambda ri: jnp.maximum(ri - 1, 0)),
            xblk(lambda ri: ri),
            xblk(lambda ri: jnp.minimum(ri + 1, nb - 1)),
            pl.BlockSpec((c, e_dim), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, e_dim), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w, w), lambda ni, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * rows, 2 * w),
                               lambda ni, ri: (ni, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rp2 * w, k), jnp.bfloat16),
            pltpu.VMEM((2 * rows, w, k), jnp.bfloat16),
            pltpu.VMEM((2 * rows, 2 * w, k), jnp.bfloat16),
        ],
        interpret=interpret,
    )(jnp.asarray(ho), jnp.asarray(hw_frac),
      xq, xq, xq, w1q.reshape(c, e_dim), sc,
      b1.astype(jnp.float32).reshape(1, e_dim), tn, wi)
    return out


def _head1_wup_kernel(xq_ref, w_ref, sc_ref, b_ref, t_ref, wi_ref,
                      o_ref, lo_ref, *, eps, rows, w_sz):
    """Row-aligned tile: int8 head1 matmul + deferred-norm correlation
    (phase 1, as _head1_kernel) into a VMEM scratch, then the x2
    W-interp as `rows` back-to-back (2W, W) @ (W, K) MXU matmuls
    (phase 2). Emits (rows, 2W, K) half-H-res logits so the XLA tail
    has only the H-interp left — which it can loop-fuse into the
    argmax the same way it fuses the W-interp today, skipping the
    0.65 ms relayout copy + 0.69 ms standalone H-interp matmul."""
    xq = xq_ref[:]                        # (rows*W, C) int8
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    e = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(e * e, axis=1, keepdims=True), eps))
    lo_ref[:] = (jax.lax.dot_general(
        e.astype(jnp.bfloat16), t_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv).astype(jnp.bfloat16)         # (rows*W, K)
    wi = wi_ref[:]                        # (2W, W) bf16
    for r in range(rows):
        o_ref[r] = jax.lax.dot_general(
            wi, lo_ref[pl.ds(r * w_sz, w_sz)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)             # (2W, K)


@functools.partial(
    jax.jit, static_argnames=("logit_scale", "rows", "interpret")
)
def head1_correlate_wup_fused(
    xq: jnp.ndarray,      # (N, H, W, C) int8 — quantized path1
    sx: jnp.ndarray,
    w1q: jnp.ndarray,     # (1, 1, C, E) int8 head1 kernel
    s1: jnp.ndarray,
    b1: jnp.ndarray,
    text_features: jnp.ndarray,  # (K, E) fp32
    logit_scale: float = 1.0 / 0.07,
    rows: int = 4,
    interpret: bool = None,
) -> jnp.ndarray:         # (N, H, 2W, K) bf16 — W-upsampled logits
    """head1_correlate_fused + in-kernel x2 align-corners W-interp
    (exact torch weights via ops.resize._interp_matrix)."""
    from lseg_tpu.ops.resize import _interp_matrix

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = xq.shape
    e_dim = w1q.shape[-1]
    k = text_features.shape[0]
    assert (n * h) % rows == 0, (n, h, rows)

    x2 = xq.reshape(n * h * w, c)
    t = text_features.astype(jnp.float32)
    tn = t * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))
    tn = (logit_scale * tn).astype(jnp.bfloat16)
    sc = (sx.astype(jnp.float32).reshape(1, 1)
          * s1.astype(jnp.float32).reshape(1, e_dim))
    wi = jnp.asarray(
        _interp_matrix(w, 2 * w, align_corners=True), jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_head1_wup_kernel, eps=1e-24, rows=rows,
                          w_sz=w),
        grid=(n * h // rows,),
        in_specs=[
            pl.BlockSpec((rows * w, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 2 * w, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, 2 * w, k), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows * w, k), jnp.bfloat16)],
        interpret=interpret,
    )(x2, w1q.reshape(c, e_dim), sc,
      b1.astype(jnp.float32).reshape(1, e_dim), tn, wi)
    return out.reshape(n, h, 2 * w, k)


def _head1_argmax_kernel(xq_ref, w_ref, sc_ref, b_ref, t_ref, o_ref, *,
                         k_real):
    """_head1_kernel ending in an in-VMEM lane argmax: only the (M, 1)
    int32 prediction map leaves the kernel — the (M, K) logit map never
    exists in HBM. The deferred-norm rsqrt and the temperature scale
    are both strictly positive per-row scalars, so argmax is invariant
    to them and they are skipped entirely (exact same winner, ties
    resolved first-occurrence either way)."""
    xq = xq_ref[:]                        # (TM, C) int8
    acc = jax.lax.dot_general(
        xq, w_ref[:],                     # (C, E) int8
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    e = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]   # (TM, E) fp32
    lo = jax.lax.dot_general(
        e.astype(jnp.bfloat16), t_ref[:],  # (Kp, E) bf16
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (TM, Kp) fp32
    # K-padding columns must never win: t padding rows are zero (logit
    # exactly 0) but real logits can be all-negative — mask them out.
    col = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
    lo = jnp.where(col < k_real, lo, -jnp.inf)
    o_ref[:] = jnp.argmax(lo, axis=-1).astype(jnp.int32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("tile_m", "interpret")
)
def head1_correlate_argmax_fused(
    xq: jnp.ndarray,      # (N, H, W, C) int8 — quantized path1
    sx: jnp.ndarray,      # fp32 scalar activation scale (amax/127)
    w1q: jnp.ndarray,     # (1, 1, C, E) int8 head1 kernel
    s1: jnp.ndarray,      # (E,) fp32 per-channel weight scales
    b1: jnp.ndarray,      # (E,) fp32 head1 bias
    text_features: jnp.ndarray,  # (K, E) fp32 raw text features
    tile_m: int = 512,
    interpret: bool = None,
) -> jnp.ndarray:         # (N, H, W) int32 class predictions
    """`head1_correlate_fused` + in-kernel argmax over K: the half-res
    serving head (reference semantics lseg_net.py:185-196 + the argmax
    of lseg_app.py:357, taken BEFORE the x2 output upsample — the
    half-res-argmax serving mode; callers nearest-upsample the label
    map). Kills the whole XLA logit tail (relayout copy + H-interp +
    W-interp/argmax ≈ 2.2 ms/batch-8 at the flagship shape): only
    (N, H, W) int32 leaves the device path.

    There is NO logit_scale parameter and NO per-pixel embedding norm
    here, intentionally: argmax is invariant to the positive
    temperature and to the positive per-pixel norm factor, so both are
    omitted from the kernel entirely (the logit-emitting variants keep
    them)."""
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
    tn = tn.astype(jnp.bfloat16)
    if kp != k:
        tn = jnp.pad(tn, ((0, kp - k), (0, 0)))

    sc = (sx.astype(jnp.float32).reshape(1, 1)
          * s1.astype(jnp.float32).reshape(1, e_dim))
    out = pl.pallas_call(
        functools.partial(_head1_argmax_kernel, k_real=k),
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
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        interpret=interpret,
    )(x2, w1q.reshape(c, e_dim), sc,
      b1.astype(jnp.float32).reshape(1, e_dim), tn)
    return out[:m, 0].reshape(n, h, w)


def _head1_argmax_t_kernel(x_ref, w_ref, sc_ref, b_ref, t_ref, o_ref, *,
                           k_real):
    """Transposed-correlation variant of `_head1_argmax_kernel`.

    Two layout wins over the row-major form:
    - the correlation runs as (Kp, E) @ (TM, E)^T -> (Kp, TM), so K only
      pads to a SUBLANE multiple (150 -> 152) instead of a lane multiple
      (150 -> 256) — 40%% less correlation arithmetic;
    - the argmax reduces over sublanes and lands the TM winners across
      LANES, so the output block is a dense (1, TM) int32 row. The
      row-major kernel's (TM, 1) output tiles at T(8,128) with 127/128
      of each tile lane-padding — the padded write inside the kernel
      plus the padded read downstream cost ~0.6 ms/batch-8 at the
      flagship shape.

    `x_ref` may be int8 (pre-quantized) or bf16 — bf16 inputs are
    quantized in-VMEM on the calibrated grid (`qinv` = 127/amax folded
    into `sc_ref`'s layout: sc row 0 = dequant scales, qinv passed via
    closure) with the exact round/clip sequence the XLA pass uses, so
    the separate (N, H, W, C) clamp_convert stream never exists.
    """
    x = x_ref[:]
    if x.dtype == jnp.int8:
        xq = x
    else:
        # exact XLA-quantize semantics: round-half-to-even, clip, cast
        # (division by the same sx operand, not multiply-by-reciprocal,
        # so the label map is bit-identical to the unfused quantize)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sc_ref[0, 0]),
                      -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],                     # (C, E) int8
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    e = acc.astype(jnp.float32) * sc_ref[1:2] + b_ref[:]  # (TM, E) fp32
    lo = jax.lax.dot_general(
        t_ref[:], e.astype(jnp.bfloat16),  # (Kp8, E) bf16, (TM, E)
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (Kp8, TM) fp32
    row = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 0)
    lo = jnp.where(row < k_real, lo, -jnp.inf)
    o_ref[:] = jnp.argmax(lo, axis=0).astype(jnp.int32)[None, :]


@functools.partial(
    jax.jit, static_argnames=("tile_m", "interpret")
)
def head1_correlate_argmax_fused_t(
    x: jnp.ndarray,       # (N, H, W, C) int8 OR bf16 path1
    sx: jnp.ndarray,      # fp32 scalar activation scale (amax/127)
    w1q: jnp.ndarray,     # (1, 1, C, E) int8 head1 kernel
    s1: jnp.ndarray,      # (E,) fp32 per-channel weight scales
    b1: jnp.ndarray,      # (E,) fp32 head1 bias
    text_features: jnp.ndarray,  # (K, E) fp32 raw text features
    tile_m: int = 1024,
    interpret: bool = None,
) -> jnp.ndarray:         # (N, H, W) int32 class predictions
    """`head1_correlate_argmax_fused` with the transposed correlation +
    dense lane-major output (see `_head1_argmax_t_kernel`), accepting
    either a pre-quantized int8 path1 or the bf16 tensor directly
    (in-kernel quantize, bit-identical label map either way).
    Like the row-major form, logit_scale and the per-pixel norm are
    intentionally absent — argmax is invariant to both positive
    factors. Reference semantics: lseg_net.py:185-196 + argmax of
    lseg_app.py:357 at half resolution."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    e_dim = w1q.shape[-1]
    k = text_features.shape[0]
    m = n * h * w
    mp = _round_up(m, tile_m)
    # sublane pad only (fp32 logits tile at (8, 128))
    kp = _round_up(k, 8)

    x2 = x.reshape(m, c)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    t = text_features.astype(jnp.float32)
    tn = t * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))
    tn = tn.astype(jnp.bfloat16)
    if kp != k:
        tn = jnp.pad(tn, ((0, kp - k), (0, 0)))

    sxf = sx.astype(jnp.float32).reshape(1, 1)
    # row 0: the raw activation scale sx (bf16 inputs divide by it —
    # same operand and op order as the unfused XLA quantize pass);
    # row 1: dequant scales sx*s1
    sc = jnp.concatenate([
        jnp.broadcast_to(sxf, (1, e_dim)),
        sxf * s1.astype(jnp.float32).reshape(1, e_dim),
    ], axis=0)
    out = pl.pallas_call(
        functools.partial(_head1_argmax_t_kernel, k_real=k),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, e_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.int32),
        interpret=interpret,
    )(x2, w1q.reshape(c, e_dim), sc,
      b1.astype(jnp.float32).reshape(1, e_dim), tn)
    return out[0, :m].reshape(n, h, w)


@functools.partial(
    jax.jit, static_argnames=("logit_scale", "tile_m", "interpret",
                              "normalize")
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
    normalize: bool = True,
) -> jnp.ndarray:         # (N, H, W, K) bf16 deferred-norm logits
    """Fused int8 head1 projection + temperature-scaled deferred-norm
    correlation (reference: modules/models/lseg_net.py:185-196 with the
    exact (e/|e|)*t == (e*t)/|e| reassociation of the fast head).

    `normalize=False` skips the per-pixel |e| division (raw e @ Tn
    scores) — the lowres-correlation serving head uses it: the division
    does not commute with the x2 upsample, but argmax at the upsampled
    resolution is invariant to the per-pixel positive factor, so the
    label map is unchanged while the correlation runs on 4x fewer
    pixels."""
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
        functools.partial(_head1_kernel, eps=1e-24, k_out=k,
                          normalize=normalize),
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
