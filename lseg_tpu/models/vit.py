"""Dense ViT image encoder with explicit multi-level taps.

TPU-first redesign of the reference's "ViT surgery" (reference:
modules/models/lseg_vit.py:104-201,408-535). Differences by design:

- No forward hooks / global `activations` dict — the encoder *returns* the
  4 tap activations from segmented `nn.scan` loops (pure function).
- No monkey-patched `forward_flex` — the position-embedding grid resize is
  a normal function of the static input shape; one jit cache entry per
  crop shape (reference: lseg_vit.py:149-201).
- Blocks between consecutive taps are stacked and scanned (`lax.scan` with
  stacked params): compile time stays flat in depth and each block can be
  rematerialized for memory.
- NHWC layout, bf16-friendly compute with fp32 softmax/LayerNorm.

Trailing blocks after the last tap and the final LayerNorm are dead compute
in the reference (only the hooked activations are consumed,
lseg_vit.py:104-146) and are therefore not instantiated at all.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lseg_tpu.config import ViTConfig, flat_flash_eligible
from lseg_tpu.ops.quant import QuantDense, StaticQuantDense
from lseg_tpu.ops.resize import resize_bilinear


def _dense(features, dtype, name, quant):
    """nn.Dense or an int8-quantized drop-in.

    quant: False/'none' -> nn.Dense; True/'dynamic' -> QuantDense (same
    param tree, weights quantized per call); 'static' -> StaticQuantDense
    (serving tree from `lseg_tpu.ops.quant.quantize_tree`).
    """
    if quant in ("static",):
        return StaticQuantDense(features, dtype=dtype, name=name)
    if quant in (True, "dynamic"):
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


def _flash_attention(q, k, v, scale, dtype):
    """Pallas TPU flash attention over a non-128-aligned token count:
    pad seq to a lane multiple and mask pad tokens out via segment ids
    (pad queries attend only each other and are sliced away). Keeps the
    24 per-block (B, H, T, T) softmax matrices out of HBM entirely.

    Block sizes are tuned for the dense-ViT regime (short seq ~1k,
    head_dim 64): the whole K/V fits VMEM (block_k = padded seq) and
    block_q=256 — measured 2.0x faster than the XLA bf16-score einsum
    attention on v5e (0.51 vs 1.00 ms/block at B=8, T=901; the library
    defaults were 3.5 ms)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    n, h, t, hd = q.shape  # heads-major in AND out (no transposes)
    tp = -(-t // 128) * 128
    pad = tp - t

    def prep(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.astype(dtype)

    seg = jnp.concatenate(
        [jnp.ones((n, t), jnp.int32), jnp.zeros((n, pad), jnp.int32)],
        axis=1,
    )
    out = flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=scale,
        block_sizes=BlockSizes(
            block_q=min(256, tp), block_k_major=tp, block_k=tp,
            block_b=1,
        ),
    )
    return out[:, :, :t]


class _QKVHeadsMajor(nn.Module):
    """qkv projection emitting (3, N, H, T, hd) heads-major directly —
    the flash kernel's native layout, skipping the reshape/slice/
    transpose churn of the (N, T, 3, H, hd) route. Param tree identical
    to nn.Dense(3*dim) (same 'kernel'/'bias' names and shapes), so
    checkpoints are interchangeable."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h = self.dim, self.num_heads
        hd = d // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d, 3 * d),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (3 * d,), jnp.float32
        )
        kr = kernel.reshape(d, 3, h, hd).astype(self.dtype)
        br = bias.reshape(3, 1, h, 1, hd).astype(self.dtype)
        y = jnp.einsum(
            "ntd,dchj->cnhtj", x, kr,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y + br


class _ProjHeadsMajor(nn.Module):
    """Output projection consuming (N, H, T, hd) heads-major directly
    (contraction over H and hd — no transpose back). Param tree
    identical to nn.Dense(dim)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h = self.dim, self.num_heads
        hd = d // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d, d), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (d,), jnp.float32
        )
        kr = kernel.reshape(h, hd, d).astype(self.dtype)
        y = jnp.einsum(
            "nhtj,hjd->ntd", x, kr, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return y + bias.astype(self.dtype)


class _QKVHeadsParam(nn.Module):
    """qkv projection with a HEAD-MAJOR param layout: kernel
    (D, 3, H, hd), bias (3, H, hd) — the tensor-parallel layout. H is a
    real param axis, so the TP rules (`parallel.mesh._TP_RULES`) shard
    it directly and per-head attention stays collective-free under
    GSPMD; the flat (D, 3D) layout's head reshape crosses shard
    boundaries and forces re-layout collectives (round-1 weakness).
    Convert from/to the flat nn.Dense layout with
    `utils.checkpoint_convert.{to,from}_tp_layout` (pure reshapes)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h = self.dim, self.num_heads
        hd = d // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(1, 2)),
            (d, 3, h, hd), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (3, h, hd), jnp.float32
        )
        y = jnp.einsum(
            "ntd,dchj->cnhtj", x, kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y + bias.astype(self.dtype)[:, None, :, None, :]


class _ProjHeadsParam(nn.Module):
    """Attention output projection with head-major params: kernel
    (H, hd, D), bias (D,). Contracting (H, hd) of a head-sharded input
    yields partial sums — GSPMD inserts exactly one all-reduce
    (Megatron row-parallel)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (N, H, T, hd)
        d, h = self.dim, self.num_heads
        hd = d // h
        # fan_in must be the full H*hd = D (matching the flat nn.Dense
        # init); lecun_normal(batch_axis=(0,)) would use fan_in=hd and
        # give H× too much variance on from-scratch TP init.
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal",
                in_axis=(0, 1), out_axis=2),
            (h, hd, d), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (d,), jnp.float32
        )
        y = jnp.einsum(
            "nhtj,hjd->ntd", x, kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y + bias.astype(self.dtype)


class _StaticDenseParams(nn.Module):
    """Declares a StaticQuantDense param triplet (kernel_q, scale,
    bias) without running the matmul — the fused Pallas kernels consume
    the raw params. Module names match the unfused path ('qkv', 'mlp/
    fc1', 'mlp/fc2') so the tree is identical to quantize_tree's
    output."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (in_dim, self.features), jnp.int8)
        sw = self.param("scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return kq, sw, b


class _MLPStaticParams(nn.Module):
    """fc1/fc2 static-quant param triplets under one 'mlp' scope."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1 = _StaticDenseParams(self.hidden, name="fc1")(self.dim)
        w2 = _StaticDenseParams(self.dim, name="fc2")(self.hidden)
        return w1, w2


class _LNParams(nn.Module):
    """Declares the LayerNorm (scale, bias) pair without applying the
    norm — the LN-fused flash kernel (attn_impl='flashlnq') consumes
    the raw params. Param names/shapes/dtype match nn.LayerNorm so the
    tree is identical to the unfused path."""

    dim: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones,
                       (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.dim,), jnp.float32)
        return g, b


class Attention(nn.Module):
    """Standard ViT multi-head self-attention (timm Block.attn semantics:
    fused qkv projection with bias, scale = head_dim**-0.5).

    impl='xla': einsum QK^T -> fp32 softmax -> PV (XLA fusion).
    impl='flash': Pallas TPU flash-attention kernel in heads-major
    layout end to end — identical math, softmax tiled in VMEM (the
    attention matrices never hit HBM)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    impl: str = "xla"
    # dtype of the (B, H, T, T) score matrix. float32 is the safe
    # default; bfloat16 halves the dominant HBM stream through the
    # softmax (softmax itself still reduces in fp32 via jax.nn.softmax's
    # internal upcast of max/sum on bf16 inputs).
    scores_dtype: Any = jnp.float32
    quant: Any = False  # False | True|'dynamic' | 'static' (int8 modes)
    # head-major (D,3,H,hd)/(H,hd,D) param layout for tensor parallelism
    tp_layout: bool = False
    block_q: int = 256  # flat flash kernel q row-block
    # actual token count when the sequence is padded to a sublane
    # multiple (flashflat path; pad keys are masked in the kernel)
    valid_len: Any = None
    # flat flash kernel interior variant ('v1' | 'v2' staged/exp2)
    kernel_variant: str = "v1"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 resid: jnp.ndarray = None,
                 ln: Any = None) -> jnp.ndarray:
        n, t, d = x.shape
        h = self.num_heads
        hd = d // h
        scale = hd ** -0.5
        flat_ok = flat_flash_eligible(d, h, self.tp_layout)
        if (self.impl == "flashlnq" and flat_ok
                and self.quant == "static" and ln is not None):
            # LayerNorm + per-row int8 quantize + int8 qkv projection +
            # flash attention in ONE kernel: `x` here is the RAW
            # residual stream; the LN output and its int8 copy never
            # exist in HBM, and no standalone LN op remains in the scan
            # body for XLA to peel (ops/pallas_attention.py).
            from lseg_tpu.ops.pallas_attention import (
                flash_attention_ln_qkv_fused_q8,
            )
            from lseg_tpu.ops.quant import int8_matmul_prequant_act

            g, bln = ln
            kq, sw, b = _StaticDenseParams(3 * d, name="qkv")(d)
            # kernel emits the attention output already row-quantized
            # (bit-identical to quantize_rows of the bf16 output), so
            # proj's dynamic quantize never touches HBM
            # in-kernel softmax stays fp32: the bf16-scores variant
            # (scores_dtype=self.scores_dtype) measured WORSE end to
            # end (32.0 vs 31.3 ms/b8 interleaved, r4 — the f32->bf16
            # cast pass costs more than the bf16 VPU chain saves);
            # kept as a kernel knob + ab_tpu int8_cf_f32s evidence
            oq, os_ = flash_attention_ln_qkv_fused_q8(
                x.astype(jnp.bfloat16), g, bln, kq, sw, b, h, scale,
                valid_len=self.valid_len,
                qk_int8=self.kernel_variant == "i8qk",
                lean=self.kernel_variant in ("lean", "leanst"),
                staged=self.kernel_variant in ("st", "leanst"),
                exp2=self.kernel_variant == "lx2",
                quad=self.kernel_variant == "quad" and h % 4 == 0,
                pairs_per_step=(
                    # 'octo' = 4 pairs (8 heads) per grid step,
                    # 'mono' = ALL pairs in one grid step per image
                    4 if self.kernel_variant == "octo" and h % 8 == 0
                    else h // 2 if (self.kernel_variant == "mono"
                                    and h % 2 == 0)
                    else None))
            kp, sp, bp = _StaticDenseParams(d, name="proj")(d)
            return int8_matmul_prequant_act(oq, os_, kp, sp, bp,
                                            out_dtype=self.dtype)
        if (self.impl == "flashqp" and flat_ok
                and self.quant == "static" and resid is not None):
            # whole attention half-block in one kernel: int8 qkv ->
            # flash -> int8 proj partials accumulated in VMEM ->
            # bias + residual (ops/pallas_attention.py)
            from lseg_tpu.ops.pallas_attention import (
                flash_attention_qkvp_fused,
            )
            from lseg_tpu.ops.quant import quantize_rows

            xq, sx = quantize_rows(x)
            kq, sw, b = _StaticDenseParams(3 * d, name="qkv")(d)
            kp, sp, bp = _StaticDenseParams(d, name="proj")(d)
            return flash_attention_qkvp_fused(
                xq, sx, kq, sw, b, kp, sp, bp,
                resid.astype(jnp.bfloat16), h, scale,
                valid_len=self.valid_len).astype(self.dtype)
        if self.tp_layout:
            qkv = _QKVHeadsParam(d, h, self.dtype, name="qkv")(x)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (N, H, T, hd)
            if self.impl == "flash":
                out = _flash_attention(q, k, v, scale, self.dtype)
            else:
                attn = jnp.einsum(
                    "nhqd,nhkd->nhqk", q, k,
                    preferred_element_type=self.scores_dtype,
                ) * jnp.asarray(scale, self.scores_dtype)
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                out = jnp.einsum(
                    "nhqk,nhkd->nhqd", attn, v,
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
            return _ProjHeadsParam(d, h, self.dtype, name="proj")(out)
        if self.impl == "flash":
            qkv = _QKVHeadsMajor(d, h, self.dtype, name="qkv")(x)
            out = _flash_attention(
                qkv[0], qkv[1], qkv[2], scale, self.dtype
            )
            return _ProjHeadsMajor(d, h, self.dtype, name="proj")(out)
        if (self.impl in ("flashq", "flashqp", "flashlnq") and flat_ok
                and self.quant == "static"):
            # int8 qkv projection fused INTO the flash kernel: consumes
            # the per-row int8-quantized LN output; the (N, T, 3D) qkv
            # tensor never exists in HBM (ops/pallas_attention.py,
            # flash_attention_qkv_fused).
            from lseg_tpu.ops.pallas_attention import (
                flash_attention_qkv_fused,
            )
            from lseg_tpu.ops.quant import quantize_rows

            xq, sx = quantize_rows(x)
            kq, sw, b = _StaticDenseParams(3 * d, name="qkv")(d)
            out = flash_attention_qkv_fused(
                xq, sx, kq, sw, b, h, scale, valid_len=self.valid_len)
            return _dense(d, self.dtype, "proj", self.quant)(out)
        if (self.impl in ("flashflat", "flashq", "flashqp", "flashlnq")
                and flat_ok):
            # custom flat-layout flash kernel: consumes the fused qkv
            # matmul's native (N, T, 3D) output and emits flat (N, T, D)
            # — no layout transitions at either boundary. Measured
            # 145.9 vs 114.0 img/s end to end on v5e (28%, interleaved
            # A/B). Scores are fp32 in VMEM (never HBM), P@V in bf16.
            # Falls through to the XLA path when head_dim != 64
            # (ops/pallas_attention.py).
            # _vjp variant: same forward kernel, plus a Pallas
            # backward (scores recomputed in VMEM, no (T,T) HBM
            # traffic) so flashflat is trainable; zero cost outside AD
            from lseg_tpu.ops.pallas_attention import (
                flash_attention_flat_vjp,
            )

            qkv = _dense(3 * d, self.dtype, "qkv", self.quant)(x)
            out = flash_attention_flat_vjp(qkv, h, scale,
                                           self.block_q, None,
                                           self.valid_len,
                                           self.kernel_variant)
            return _dense(d, self.dtype, "proj", self.quant)(out)
        if self.impl == "flash2":
            # flat qkv matmul (fastest emitter) + explicit transposes to
            # the kernel's heads-major layout — A/B alternative to the
            # fused heads-major einsum whose strided output write is
            # slow (0.49 vs 0.27 ms/block profiled)
            qkv = _dense(3 * d, self.dtype, "qkv", self.quant)(x)
            qkv = qkv.reshape(n, t, 3, h, hd).transpose(2, 0, 3, 1, 4)
            out = _flash_attention(
                qkv[0], qkv[1], qkv[2], scale, self.dtype
            )
            out = out.transpose(0, 2, 1, 3).reshape(n, t, d)
            return _dense(d, self.dtype, "proj", self.quant)(out)
        qkv = _dense(3 * d, self.dtype, "qkv", self.quant)(x)
        qkv = qkv.reshape(n, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.impl == "dpa":
            # XLA's fused attention path; (B, T, H, hd) layout native
            out = jax.nn.dot_product_attention(q, k, v, scale=scale)
        else:
            attn = jnp.einsum(
                "nqhd,nkhd->nhqk", q, k,
                preferred_element_type=self.scores_dtype,
            ) * jnp.asarray(scale, self.scores_dtype)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "nhqk,nkhd->nqhd", attn, v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        out = out.reshape(n, t, d)
        return _dense(d, self.dtype, "proj", self.quant)(out)


class Mlp(nn.Module):
    """timm ViT MLP: fc1 -> GELU -> fc2. `gelu='exact'` (erf) matches
    timm/torch bit-for-bit and is the parity default; `gelu='tanh'`
    (the tanh approximation) is ~12% faster end to end on v5e (the erf
    transcendentals dominate the fc2 fusion) at a small, weights-were-
    trained-with-erf numerical deviation — validate mIoU before using
    it for reported numbers."""

    dim: int
    hidden: int
    dtype: Any = jnp.float32
    quant: Any = False  # False | True|'dynamic' | 'static' (int8 modes)
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _dense(self.hidden, self.dtype, "fc1", self.quant)(x)
        x = jax.nn.gelu(x, approximate=(self.gelu == "tanh"))
        return _dense(self.dim, self.dtype, "fc2", self.quant)(x)


class Block(nn.Module):
    """Pre-norm transformer block (timm ViT): x += attn(ln1(x));
    x += mlp(ln2(x)). LayerNorm eps=1e-6 per timm ViT defaults.

    The residual stream runs 2-D-collapsed ((N*T, D)) through the
    LayerNorms and MLP — measured ~3.5% faster end to end on v5e than
    the 3-D form (XLA picks a better matmul emitter); attention reshapes
    to (N, T, D) internally. Param tree is unchanged."""

    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    attn_scores_dtype: Any = jnp.float32
    quant: Any = False  # False | True|'dynamic' | 'static' (int8 modes)
    gelu: str = "exact"
    tp_layout: bool = False
    block_q: int = 256
    valid_len: Any = None
    kernel_variant: str = "v1"
    mlp_fused: bool = False
    ln_quant_fused: bool = False
    mlp_act_cal: bool = False
    emit_y: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        n, t, d = x.shape
        hidden = int(self.dim * self.mlp_ratio)
        x2 = x.reshape(n * t, d)
        attn = Attention(self.dim, self.num_heads, self.dtype,
                         self.attn_impl, self.attn_scores_dtype,
                         self.quant, self.tp_layout, self.block_q,
                         self.valid_len, self.kernel_variant,
                         name="attn")
        flat_ok = flat_flash_eligible(
            self.dim, self.num_heads, self.tp_layout)
        if (self.attn_impl == "flashlnq" and self.quant == "static"
                and flat_ok):
            # LN1 lives INSIDE the fused kernel: declare its params
            # (same tree as nn.LayerNorm) and hand the raw residual
            # stream to attention
            g, bln = _LNParams(d, name="norm1")()
            a = attn(x2.reshape(n, t, d), ln=(g, bln))
            x2 = x2 + a.reshape(n * t, d)
        elif (self.attn_impl == "flashqp" and self.quant == "static"
                and flat_ok):
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm1")(x2)
            # fused kernel returns resid + proj(attn(...)) directly
            x2 = attn(y.reshape(n, t, d),
                      resid=x2.reshape(n, t, d)).reshape(n * t, d)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm1")(x2)
            a = attn(y.reshape(n, t, d))
            x2 = x2 + a.reshape(n * t, d)
        if (self.ln_quant_fused and self.quant == "static"
                and not self.mlp_fused
                and t % 8 == 0 and d % 128 == 0):
            # LN2 + per-row int8 quantize in one Pallas pass
            # (ops/pallas_ln.py): the normalized bf16 tensor never hits
            # HBM and no standalone LN op remains for XLA to peel. The
            # int8 MLP matmuls stay XLA (identical math to the static
            # Mlp path, StaticQuantDense semantics).
            from lseg_tpu.ops.pallas_ln import (
                int8_matmul_preact,
                ln_quantize_rows,
            )

            g2, b2 = _LNParams(d, name="norm2")()
            yq, sy = ln_quantize_rows(x2.reshape(n, t, d), g2, b2)
            (k1, s1, b1), (k2, s2, bb2) = _MLPStaticParams(
                self.dim, hidden, name="mlp")()
            h = (int8_matmul_preact(
                yq.reshape(n * t, d), sy.reshape(n * t, 1), k1, s1,
                out_dtype=self.dtype) + b1.astype(self.dtype))
            h = jax.nn.gelu(h, approximate=(self.gelu == "tanh"))
            from lseg_tpu.ops.quant import int8_matmul_prequant

            if self.mlp_act_cal:
                # calibrated static per-tensor scale for the GELU
                # hidden (ViTConfig.mlp_act_cal): fc1's epilogue emits
                # int8 directly, removing the (N*T, 4D) bf16 round
                # trip + the separate row-max/convert pass of the
                # dynamic path. Calibration forwards (mutable
                # 'quant_cal') sow the running amax and keep the exact
                # dynamic math, mirroring StaticQuantConv(static_act).
                act = self.param("act_scale", nn.initializers.ones,
                                 (), jnp.float32)
                if self.is_mutable_collection("quant_cal"):
                    amax = jnp.max(jnp.abs(h.astype(jnp.float32)))
                    self.sow("quant_cal", "amax", amax,
                             init_fn=lambda: jnp.float32(0.0),
                             reduce_fn=jnp.maximum)
                    x2 = x2 + (int8_matmul_prequant(
                        h, k2, s2, out_dtype=self.dtype)
                        + bb2.astype(self.dtype))
                else:
                    sh = jnp.maximum(act, 1e-8) / 127.0
                    hq = jnp.clip(
                        jnp.round(h.astype(jnp.float32) / sh),
                        -127, 127).astype(jnp.int8)
                    x2 = x2 + (int8_matmul_preact(
                        hq, sh.reshape(1, 1), k2, s2,
                        out_dtype=self.dtype)
                        + bb2.astype(self.dtype))
            else:
                x2 = x2 + (int8_matmul_prequant(
                    h, k2, s2, out_dtype=self.dtype)
                    + bb2.astype(self.dtype))
        elif (self.mlp_fused and self.quant == "static"
                and self.gelu == "tanh"):
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm2")(x2)
            # fused int8 MLP kernel: fc1+GELU+requant+fc2+residual in
            # VMEM; the (N, T, 4D) hidden activation never hits HBM
            # (ops/pallas_mlp.py). Same params as the unfused path.
            from lseg_tpu.ops.pallas_mlp import mlp_fused
            from lseg_tpu.ops.quant import quantize_rows

            yq, sy = quantize_rows(y)
            w1, w2 = _MLPStaticParams(self.dim, hidden, name="mlp")()
            x2 = mlp_fused(
                yq.reshape(n, t, d), sy.reshape(n, t, 1),
                x2.reshape(n, t, d).astype(jnp.bfloat16),
                *w1, *w2,
            ).astype(self.dtype).reshape(n * t, d)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm2")(x2)
            x2 = x2 + Mlp(self.dim, hidden,
                          self.dtype, quant=self.quant, gelu=self.gelu,
                          name="mlp")(y)
        out = x2.reshape(n, t, d)
        # emit_y: stream every block's output as a scan y so a single
        # whole-depth scan can gather hook taps afterwards (the
        # single_scan experiment; costs one extra (N,T,D) HBM write
        # per iteration)
        return out, (out if self.emit_y else None)


class BlockStack(nn.Module):
    """`n` transformer blocks with stacked params, run under lax.scan.

    Stacking keeps compile time flat in depth; `remat` trades FLOPs for
    HBM by rematerializing each block's activations in the backward pass.
    """

    n: int
    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: Any = jnp.float32
    remat: bool = False
    # jax.checkpoint policy for the remat (None = full recompute;
    # e.g. jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # keeps matmul outputs and recomputes only elementwise chains)
    remat_policy: Any = None
    attn_impl: str = "xla"
    attn_scores_dtype: Any = jnp.float32
    quant: Any = False  # False | True|'dynamic' | 'static' (int8 modes)
    gelu: str = "exact"
    tp_layout: bool = False
    block_q: int = 256
    valid_len: Any = None
    kernel_variant: str = "v1"
    mlp_fused: bool = False
    ln_quant_fused: bool = False
    mlp_act_cal: bool = False
    emit_ys: bool = False
    # lax.scan unroll factor (ViTConfig.scan_unroll): >= n removes the
    # while loop (no peel, no weight-slice copies); params stay stacked
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        block_cls = (nn.remat(Block, policy=self.remat_policy)
                     if self.remat else Block)
        scan = nn.scan(
            block_cls,
            # quant_cal: per-block MLP-hidden amax sown during
            # mlp_act_cal calibration forwards (stacked like params)
            variable_axes={"params": 0, "quant_cal": 0},
            split_rngs={"params": True},
            length=self.n,
            unroll=min(self.scan_unroll, self.n),
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        x, ys = scan(
            dim=self.dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            attn_scores_dtype=self.attn_scores_dtype,
            quant=self.quant,
            gelu=self.gelu,
            tp_layout=self.tp_layout,
            block_q=self.block_q,
            valid_len=self.valid_len,
            kernel_variant=self.kernel_variant,
            mlp_fused=self.mlp_fused,
            ln_quant_fused=self.ln_quant_fused,
            mlp_act_cal=self.mlp_act_cal,
            emit_y=self.emit_ys,
            name="blocks",
        )(x, None)
        return (x, ys) if self.emit_ys else x


class _PatchEmbed(nn.Module):
    """Stride-p patchify as an MXU matmul; identical params/math to
    nn.Conv(d, (p, p), strides=(p, p), padding='VALID').

    `fused=True` (serving opt-in, ViTConfig.patch_fused) runs the
    Pallas patchify+embed kernel (`ops/pallas_patch.py`) — same math up
    to fp32 reassociation of the per-patch-row partial sums."""

    dim: int
    patch: int
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        p = self.patch
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, c, self.dim), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        if self.fused and self.dtype == jnp.bfloat16:
            from lseg_tpu.ops.pallas_patch import patch_embed_fused
            return patch_embed_fused(x, kernel, bias, p, self.dim)
        # keep (p*c) merged as the minor dim through the transpose: the
        # 6-D form's (p, c) minor dims force a lane-hostile relayout
        # copy (c=3 pads to 128 lanes); this form is bit-identical and
        # measured ~0.1 ms faster at the flagship shape (r4)
        xp = x.reshape(n, gh, p, gw, p * c).transpose(0, 1, 3, 2, 4)
        xp = xp.reshape(n, gh * gw, p * p * c)
        y = jnp.dot(
            xp.astype(self.dtype),
            kernel.reshape(p * p * c, self.dim).astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y + bias.astype(jnp.float32)).astype(self.dtype)


class DenseViT(nn.Module):
    """ViT encoder returning the token sequences at the 4 hook depths.

    Input:  x (N, H, W, 3), H and W multiples of `patch_size`.
    Output: list of 4 arrays (N, 1 + gh*gw, D) — block outputs at
    cfg.hooks (reference hook indices: lseg_net.py:119-123), cls token
    first, plus the (gh, gw) grid shape.
    """

    cfg: ViTConfig
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[List[jnp.ndarray], Tuple[int, int]]:
        cfg = self.cfg
        n, h, w, _ = x.shape
        p = cfg.patch_size
        assert h % p == 0 and w % p == 0, (h, w, p)
        gh, gw = h // p, w // p
        d = cfg.embed_dim

        # Patch embedding: p×p stride-p conv == per-patch linear. The
        # conv formulation measured 0.93 ms at the flagship shape (XLA's
        # conv emitter handles the 3-channel input at ~3% of the MXU
        # rate); explicit patchify + one (N·gh·gw, p·p·3) @ (p·p·3, D)
        # matmul is the identical computation at matmul speed. Param
        # tree unchanged (kernel (p, p, 3, D) + bias under
        # 'patch_embed', HWIO order matches the flattening).
        x = _PatchEmbed(d, p, self.dtype, fused=cfg.patch_fused,
                        name="patch_embed")(x)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, d), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, d)), x], axis=1
        )

        # Position embedding, bilinearly resized from the pretraining grid
        # to (gh, gw). torch default align_corners=False semantics
        # (reference: lseg_vit.py:158).
        g0 = cfg.pretrain_grid
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + g0 * g0, d),
            jnp.float32,
        )
        pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (g0, g0):
            pos_grid = pos_grid.reshape(1, g0, g0, d)
            pos_grid = resize_bilinear(pos_grid, gh, gw, align_corners=False)
            pos_grid = pos_grid.reshape(1, gh * gw, d)
        pos = jnp.concatenate([pos_tok, pos_grid], axis=1)
        x = x + pos.astype(self.dtype)

        # flashflat path: pad the token count to a sublane multiple so
        # the residual stream's 2D<->3D reshapes are free bitcasts
        # (rows % 8 != 0 forces ~0.7 ms tile-repack copies per segment
        # boundary on v5e). Pad keys are masked inside the kernel; pad
        # rows never mix into real tokens (attention is the only
        # cross-token op) and are sliced off the taps.
        t_tokens = 1 + gh * gw
        valid_len = None
        if (cfg.attn_impl in ("flashflat", "flashq", "flashlnq")
                and flat_flash_eligible(d, cfg.num_heads, cfg.tp_layout)
                and t_tokens % 8 != 0):
            tp = -(-t_tokens // 8) * 8
            x = jnp.pad(x, ((0, 0), (0, tp - t_tokens), (0, 0)))
            valid_len = t_tokens

        common = dict(
            dim=d,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            attn_impl=cfg.attn_impl,
            attn_scores_dtype=(
                jnp.bfloat16 if cfg.attn_scores_dtype == "bfloat16"
                else jnp.float32
            ),
            quant=cfg.quant_int8,
            gelu=cfg.mlp_gelu,
            tp_layout=cfg.tp_layout,
            block_q=cfg.attn_block_q,
            valid_len=valid_len,
            kernel_variant=cfg.attn_variant,
            mlp_fused=cfg.mlp_fused,
            ln_quant_fused=cfg.ln_quant_fused,
            mlp_act_cal=cfg.mlp_act_cal,
            scan_unroll=cfg.scan_unroll,
        )
        taps: List[jnp.ndarray] = []
        if cfg.single_scan:
            # one whole-depth scan; every block output streams to ys
            # and the hook taps are static slices of it
            _, ys = BlockStack(
                n=cfg.hooks[-1] + 1, emit_ys=True, name="segall",
                **common,
            )(x)
            for hook in cfg.hooks:
                t = ys[hook]
                taps.append(t[:, :t_tokens] if valid_len else t)
            return taps, (gh, gw)

        # Segmented scan: blocks [0..h0], (h0..h1], (h2..h3] — each segment
        # ends exactly at a hook, so the segment outputs ARE the taps.
        prev = -1
        for i, hook in enumerate(cfg.hooks):
            seg_len = hook - prev
            x = BlockStack(
                n=seg_len, name=f"seg{i}", **common,
            )(x)
            taps.append(x[:, :t_tokens] if valid_len else x)
            prev = hook
        return taps, (gh, gw)
