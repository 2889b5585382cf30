"""Int8 quantized matmul paths (opt-in serving modes).

v5e's MXU runs int8 at 2× the bf16 rate (394 vs 197 TOPS). This module
provides two quantized dense layers for the transformer hot path:

- `QuantDense` (dynamic): weights are symmetric per-output-channel int8
  quantized from the fp32 params AT APPLY TIME. Checkpoint-tree
  compatible with nn.Dense, but the per-call weight quantize re-reads
  the full fp32 weight tree every forward (~1.2 GB HBM for ViT-L) —
  measured SLOWER than bf16 end to end (92.3 vs 101 img/s, round 1).
- `StaticQuantDense` (static): weights are PRE-quantized once at load
  time by `quantize_tree` and stored in the serving param tree as
  int8 `kernel_q` + fp32 per-channel `scale`. No per-call weight pass,
  and the weight HBM stream drops 4× vs fp32 / 2× vs bf16. This is the
  serving mode that can beat the bf16 roofline.

Both use: symmetric per-row (per-token) dynamic int8 activations,
int32 MXU accumulation, dequantized as (row_scale ⊗ col_scale).

Accuracy: per-channel weight + per-token activation symmetric
quantization is the standard recipe for ViT inference; parity-sensitive
paths keep the bf16/fp32 route (`quant_int8=False`, the default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """(..., K) -> int8 with per-row scale (..., 1)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """(K, N) -> int8 with per-column scale (1, N)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul_prequant(x: jnp.ndarray, wq: jnp.ndarray,
                         sw: jnp.ndarray,
                         out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(wq, sw) with per-token dynamic int8 activations
    and an int32 MXU accumulation. x: (..., K); wq int8 (K, N); sw fp32
    (N,) or (1, N) per-output-channel scales."""
    xq, sx = quantize_rows(x)
    lead = xq.shape[:-1]
    y = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx.reshape(-1, 1) * sw.reshape(1, -1)
    return y.reshape(*lead, wq.shape[-1]).astype(out_dtype)


def int8_matmul_prequant_act(xq: jnp.ndarray, sx: jnp.ndarray,
                             wq: jnp.ndarray, sw: jnp.ndarray,
                             bias: jnp.ndarray | None = None,
                             out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """`int8_matmul_prequant` with the ACTIVATIONS also pre-quantized
    (int8 xq + per-row scales sx, e.g. emitted by a fused kernel).
    Bias is added after the out_dtype cast, mirroring
    `StaticQuantDense` exactly so results are bit-identical."""
    lead = xq.shape[:-1]
    y = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx.reshape(-1, 1) * sw.reshape(1, -1)
    y = y.reshape(*lead, wq.shape[-1]).astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ w with both operands dynamically int8-quantized and an
    int32 MXU accumulation. x: (..., K); w: (K, N)."""
    wq, sw = quantize_cols(w)
    return int8_matmul_prequant(x, wq, sw, out_dtype=out_dtype)


def quantize_tensor(x: jnp.ndarray, eps: float = 1e-8):
    """(..., ) -> int8 with one per-tensor scale (dynamic scalar)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv_prequant(
    x: jnp.ndarray,          # (N, H, W, Cin)
    wq: jnp.ndarray,         # int8 (kh, kw, Cin, Cout)
    sw: jnp.ndarray,         # fp32 (Cout,) per-output-channel scales
    strides=(1, 1),
    padding=((0, 0), (0, 0)),
    out_dtype=jnp.bfloat16,
    act_scale=None,          # fp32 scalar; None -> dynamic max|x|/127
) -> jnp.ndarray:
    """NHWC conv with pre-quantized int8 weights, per-tensor int8
    activations (dynamic by default, or a calibrated `act_scale`),
    int32 MXU accumulation. v5e runs s8xs8->s32 convs at 2x the bf16
    rate; the decoder's 3x3 256-ch convs are pure MXU-bound (measured
    ~100%% of the bf16 roofline, scripts/conv_ab.py) so halving their
    arithmetic is the only remaining lever there."""
    if act_scale is None:
        xq, sx = quantize_tensor(x)
    else:
        sx = act_scale
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32)
            * (sx * sw.reshape(1, 1, 1, -1))).astype(out_dtype)


class StaticQuantConv(nn.Module):
    """nn.Conv variant consuming PRE-quantized weights (int8 `kernel_q`
    + fp32 per-output-channel `scale`), the conv analog of
    `StaticQuantDense`. Build the serving tree with `quantize_tree`.

    `static_act=True` additionally uses a CALIBRATED per-tensor
    activation scale (`act_scale` param, filled by
    `calibrate_act_scales`) instead of computing max|x| per call — the
    dynamic amax reductions are full HBM passes over the conv inputs
    and show up as the decoder's biggest non-conv cost (~0.35 ms each
    at the 120-res RCU inputs on v5e). During calibration (apply with
    `mutable=['quant_cal']`) the layer sows its running amax and falls
    back to the dynamic scale."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    static_act: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros,
            (kh, kw, cin, self.features), jnp.int8,
        )
        sw = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        sx = None
        if self.static_act:
            act_scale = self.param(
                "act_scale", nn.initializers.ones, (), jnp.float32
            )
            if self.is_mutable_collection("quant_cal"):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                self.sow("quant_cal", "amax", amax,
                         init_fn=lambda: jnp.float32(0.0),
                         reduce_fn=jnp.maximum)
                sx = jnp.maximum(amax, 1e-8) / 127.0
            else:
                sx = act_scale / 127.0
        y = int8_conv_prequant(
            x, kq, sw, strides=self.strides, padding=self.padding,
            out_dtype=self.dtype, act_scale=sx,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + b.astype(self.dtype)
        return y


class QuantDense(nn.Module):
    """Drop-in nn.Dense with the int8 dynamic-quant matmul. Same param
    tree (fp32 'kernel'/'bias'), so checkpoints are interchangeable with
    nn.Dense."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, self.features),
            jnp.float32,
        )
        y = int8_matmul(x, kernel, out_dtype=self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + b.astype(self.dtype)
        return y


class StaticQuantDense(nn.Module):
    """nn.Dense variant consuming PRE-quantized weights: int8 `kernel_q`
    + fp32 per-output-channel `scale` (+ fp32 `bias`). Build the serving
    param tree from an fp32 tree with `quantize_tree` — `model.init`
    only creates placeholder zeros/ones."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (k, self.features), jnp.int8
        )
        sw = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = int8_matmul_prequant(x, kq, sw, out_dtype=self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + b.astype(self.dtype)
        return y


# Transformer-block projections eligible for static quantization:
# attention qkv/proj and MLP fc1/fc2 (the ViT matmul hot path —
# reference regime: modules/models/lseg_vit.py:196-197, the 24 timm
# blocks). Matched by (parent-module, leaf-module) name so decoder
# convs / readout projections are never touched.
_QUANT_LEAVES = {("attn", "qkv"), ("attn", "proj"),
                 ("mlp", "fc1"), ("mlp", "fc2")}

# Decoder/head conv leaves eligible for static quantization (the
# cfg.decoder_quant='static' serving knob): reassemble 1x1 projections
# + the stride-2 resample conv, scratch 3x3s, RCU 3x3s, fusion
# out_convs, and head1. TokenUpsample kernels are left fp32 (different
# layout, negligible cost).
_QUANT_CONV_LEAVES = (
    {(f"reassemble{i}", "proj") for i in range(1, 5)}
    | {("reassemble4", "resample")}
    | {("readout", "project")}  # ProjectReadout dense (2D -> D)
    | {("scratch", f"layer{i}_rn") for i in range(1, 5)}
    | {(f"rcu{i}", f"conv{j}") for i in (1, 2) for j in (1, 2)}
    | {(f"refinenet{i}", "out_conv") for i in range(1, 5)}
    | {("head1",)}
)


def quantize_tree(params, leaves=None, decoder=False, act_scale=False,
                  mlp_act_scale=None):
    """fp32 param tree -> static-quant serving tree.

    For every Dense subtree ``{kernel, bias}`` at a path whose last two
    module names are in `leaves` (default: the transformer-block
    projections), replace ``kernel`` (..., K, N) with ``kernel_q`` int8
    (..., K, N) + ``scale`` fp32 (..., N) — symmetric per-output-channel,
    scale = max|w|/127, the exact grid `QuantDense` uses dynamically.
    Leading axes (nn.scan block stacking) are preserved. Everything else
    is passed through unchanged, so the result drops into
    ``model.apply`` for a model built with ``quant_int8='static'``.

    ``decoder=True`` additionally quantizes the decoder/head conv
    kernels (`_QUANT_CONV_LEAVES`) for a model built with
    ``decoder_quant='static'`` — per-output-channel over (kh, kw, Cin).

    ``mlp_act_scale`` gates the transformer-block MLP-hidden act_scale
    leaf (the ViTConfig.mlp_act_cal knob) SEPARATELY from the decoder
    conv act scales: a tree for a model built with mlp_act_cal=False
    must stay structurally identical to its init (the leaf would ride
    through nn.scan as an unused sliced param and break structural
    comparisons). Default None follows ``act_scale``; pass False when
    the target config has mlp_act_cal=False but calibrated decoder
    scales (bench.py's fallback-ladder rungs do).
    """
    if mlp_act_scale is None:
        mlp_act_scale = act_scale
    leaves = _QUANT_LEAVES if leaves is None else leaves
    conv_leaves = _QUANT_CONV_LEAVES if decoder else set()

    from collections.abc import Mapping

    def rec(node, path):
        if not isinstance(node, Mapping):
            return node
        tail2, tail1 = tuple(path[-2:]), tuple(path[-1:])
        if (mlp_act_scale and "attn" in node and "mlp" in node
                and isinstance(node["mlp"], Mapping)
                and "fc1" in node["mlp"]):
            # transformer-block container: add the MLP-hidden act_scale
            # placeholder (ViTConfig.mlp_act_cal — calibrated static
            # per-tensor scale for the GELU output, so fc1's epilogue
            # emits int8 directly instead of a bf16 round trip + a
            # separate convert pass). Stacked (L,) under nn.scan.
            # fc1 holds 'kernel' in an fp32 (parity-init / checkpoint)
            # tree and 'kernel_q' in a fast-init tree; a fast-init tree
            # already declares act_scale (Block.self.param) — keep it.
            fc1 = node["mlp"]["fc1"]
            w1 = fc1["kernel"] if "kernel" in fc1 else fc1["kernel_q"]
            shape = (w1.shape[0],) if w1.ndim == 3 else ()
            out = {k: rec(v, path + (k,)) for k, v in node.items()}
            out.setdefault("act_scale", jnp.ones(shape, jnp.float32))
            return out
        if "kernel" in node and tail2 in leaves:
            w = jnp.asarray(node["kernel"], jnp.float32)
            amax = jnp.max(jnp.abs(w), axis=-2)
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127)
            out = {"kernel_q": q.astype(jnp.int8), "scale": scale}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        if "kernel" in node and (tail2 in conv_leaves
                                 or tail1 in conv_leaves):
            w = jnp.asarray(node["kernel"], jnp.float32)
            if w.ndim == 2:  # dense leaf (readout project): (K, N)
                amax = jnp.max(jnp.abs(w), axis=0)
            else:            # conv kernel (kh, kw, ci, co)
                amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale), -127, 127)
            out = {"kernel_q": q.astype(jnp.int8), "scale": scale}
            if act_scale and w.ndim == 4:
                # conv act-scale placeholder; fill via calibrate_act_scales
                out["act_scale"] = jnp.ones((), jnp.float32)
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: rec(v, path + (k,)) for k, v in node.items()}

    return rec(params, ())


def calibrate_act_scales(model, variables, *apply_args, **apply_kw):
    """Fill the `act_scale` params of a `decoder_quant='static_cal'`
    model by running calibration forwards.

    Runs `model.apply(variables, *apply_args, mutable=['quant_cal'])`;
    every `StaticQuantConv(static_act=True)` sows its input max|x| into
    the `quant_cal` collection (reduced with `maximum`, so several
    calls with different batches can be folded by passing the returned
    tree back in). Returns a new `variables` dict whose `act_scale`
    leaves hold the observed amaxes.

    This is standard post-training static activation quantization: the
    per-call amax reductions are full HBM passes over the conv inputs
    (~1.4 ms/batch-8 in the refinenet1 RCUs alone on v5e); calibrated
    scales remove them from the serving path. Inputs outside the
    calibrated range are clipped — calibrate on representative data.
    """
    from collections.abc import Mapping

    # One jitted program: the eager path dispatches every primitive
    # individually, which costs minutes over relayed TPU backends.
    def _cal_forward(v, *a):
        _, st = model.apply(v, *a, mutable=["quant_cal"], **apply_kw)
        return st

    state = jax.jit(_cal_forward)(variables, *apply_args)
    # amax leaves are tiny scalars: pull to host so the tree rebuild
    # below costs zero device round-trips.
    cal = jax.device_get(state["quant_cal"])

    def rec(p, c):
        if not isinstance(p, Mapping):
            return p
        out = {}
        for k, v in p.items():
            if (k == "act_scale" and isinstance(c, Mapping)
                    and "amax" in c):
                val = c["amax"]
                val = val[0] if isinstance(val, (tuple, list)) else val
                out[k] = jnp.maximum(jnp.asarray(val, jnp.float32),
                                     1e-8)
            else:
                out[k] = rec(v, c.get(k, {}) if isinstance(c, Mapping)
                             else {})
        return out

    new = dict(variables)
    new["params"] = rec(variables["params"], cal)
    return new


class QConvParams(nn.Module):
    """Declares a StaticQuantConv-compatible param set (kernel_q, scale
    [, bias][, act_scale]) WITHOUT running the conv — for fused Pallas
    kernels that consume the raw params (the fused serving head and the
    fused decoder tail). Named identically to the conv it replaces so
    the serving tree is unchanged."""

    features: int
    kernel_size: tuple = (1, 1)
    use_bias: bool = True
    static_act: bool = False

    @nn.compact
    def __call__(self, cin: int):
        kh, kw = self.kernel_size
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, cin, self.features), jnp.int8)
        sw = self.param("scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        act = (self.param("act_scale", nn.initializers.ones, (),
                          jnp.float32) if self.static_act else None)
        return kq, sw, b, act
