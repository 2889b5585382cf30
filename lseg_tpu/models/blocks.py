"""DPT decoder blocks: readout, reassemble, scratch projection, and
RefineNet-style fusion — TPU-native (NHWC, matmul-lowered resampling).

Reference semantics being reproduced:
- readout ops (reference: modules/models/lseg_vit.py:57-90,204-218)
- reassemble pipelines act_postprocess1..4 (lseg_vit.py:446-523)
- scratch 3×3 projections (modules/models/lseg_blocks.py:60-110)
- ResidualConvUnit_custom / FeatureFusionBlock_custom
  (lseg_blocks.py:222-358)
- spatial regularization head blocks (modules/models/lseg_net.py:29-79)

The k=s transposed convs of the reassemble stage are expressed as a single
dense matmul + pixel-shuffle reshape (each input token independently emits
an s×s output tile), which XLA maps straight onto the MXU instead of a
grad-style transposed convolution.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lseg_tpu.ops.resize import upsample2x


def _conv(features, kernel_size, quant, dtype, name, strides=(1, 1),
          padding=((0, 0), (0, 0)), use_bias=True):
    """nn.Conv or its pre-quantized int8 twin (`StaticQuantConv`),
    selected by the serving `quant` knob ('static' -> int8 with dynamic
    per-tensor activation scales; 'static_cal' -> calibrated scales,
    see ops.quant.calibrate_act_scales)."""
    if quant in ("static", "static_cal"):
        from lseg_tpu.ops.quant import StaticQuantConv
        return StaticQuantConv(
            features, kernel_size, strides=strides,
            padding=tuple(tuple(p) for p in padding),
            use_bias=use_bias, dtype=dtype,
            static_act=quant == "static_cal", name=name,
        )
    return nn.Conv(
        features, kernel_size, strides=strides,
        padding=[tuple(p) for p in padding], use_bias=use_bias,
        dtype=dtype, name=name,
    )


class ProjectReadout(nn.Module):
    """Fuse the cls token into each patch token: concat(patch, cls) ->
    Linear(2D->D) -> exact GELU (reference: lseg_vit.py:79-90).

    `quant` in ('static', 'static_cal') swaps the (2D, D) projection
    for the pre-quantized int8 dense (0.15 ms/tap bf16 at ViT-L batch
    8 — the largest dense matmul outside the transformer blocks)."""

    dim: int
    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, d = x.shape
        cls = jnp.broadcast_to(x[:, :1], (n, t - 1, d))
        feats = jnp.concatenate([x[:, 1:], cls], axis=-1)
        if self.quant in ("static", "static_cal"):
            from lseg_tpu.ops.quant import StaticQuantDense
            y = StaticQuantDense(self.dim, dtype=self.dtype,
                                 name="project")(feats)
        else:
            y = nn.Dense(self.dim, dtype=self.dtype, name="project")(feats)
        return jax.nn.gelu(y, approximate=False)


def apply_readout(
    module_parent: nn.Module,
    x: jnp.ndarray,
    readout: str,
    dim: int,
    dtype: Any,
    name: str,
    quant: Any = False,
) -> jnp.ndarray:
    """Apply one of the three readout ops (reference: lseg_vit.py:204-218).
    Returns patch tokens only, (N, gh*gw, D)."""
    if readout == "ignore":
        return x[:, 1:]
    if readout == "add":
        return x[:, 1:] + x[:, :1]
    if readout == "project":
        return ProjectReadout(dim, dtype, quant,
                              parent=module_parent, name=name)(x)
    raise ValueError(f"unknown readout {readout!r}")


class TokenUpsample(nn.Module):
    """k=s stride-s ConvTranspose as matmul + pixel shuffle.

    Equivalent to nn.ConvTranspose2d(C, C, kernel_size=s, stride=s)
    (reference: lseg_vit.py:457-489): every input pixel independently
    produces an s×s block of outputs.
    """

    channels: int
    scale: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        s = self.scale
        # weight laid out (C_in, s, s, C_out) so the matmul output reshapes
        # directly into the pixel-shuffled tile.
        wkern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c, s, s, self.channels),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.channels,), jnp.float32
        )
        y = jnp.einsum(
            "nhwc,cijo->nhiwjo",
            x,
            wkern.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        # bias-add + downcast BEFORE the pixel-shuffle reshape: the
        # (n,h,s,w,s,o)->(n,hs,ws,o) interleave materializes a relayout
        # copy, and running it on bf16 instead of the fp32 matmul output
        # halves its HBM traffic (profiled 0.375 ms at the reassemble1
        # 120x120x256 shape). Same math: bias broadcasts over the last
        # dim either side of the reshape.
        y = (y + b.astype(jnp.float32)).astype(self.dtype)
        return y.reshape(n, h * s, w * s, self.channels)


class Reassemble(nn.Module):
    """Token sequence -> CNN feature map at one pyramid level:
    readout -> unflatten(gh,gw) -> 1×1 conv -> resample
    (reference: lseg_vit.py:446-523 / forward_vit lseg_vit.py:104-146)."""

    out_channels: int
    resample: float  # 4/2 = token upsample, 1 = identity, 0.5 = s2 conv
    vit_dim: int
    readout: str
    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, grid: Tuple[int, int]
    ) -> jnp.ndarray:
        gh, gw = grid
        x = apply_readout(
            self, tokens, self.readout, self.vit_dim, self.dtype,
            "readout", self.quant,
        )
        n = x.shape[0]
        x = x.reshape(n, gh, gw, self.vit_dim)
        x = _conv(
            self.out_channels, (1, 1), self.quant, self.dtype, "proj"
        )(x)
        if self.resample > 1:
            x = TokenUpsample(
                self.out_channels, int(self.resample), self.dtype,
                name="resample",
            )(x)
        elif self.resample < 1:
            x = _conv(
                self.out_channels, (3, 3), self.quant, self.dtype,
                "resample", strides=(2, 2), padding=((1, 1), (1, 1)),
            )(x)
        return x


class _BNStats(nn.Module):
    """Declares an nn.BatchNorm-compatible variable set (params
    scale/bias + batch_stats mean/var) without running the norm — the
    fused RCU kernel folds the eval-mode affine into its dequant
    epilogue. Named identically to the BatchNorm it mirrors."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones,
                       (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return g, b, mean.value, var.value


class ResidualConvUnit(nn.Module):
    """RCU: relu -> 3×3 conv -> [BN] -> relu -> 3×3 conv -> [BN], + residual
    (reference: lseg_blocks.py:222-290). Conv bias only when BN is off.

    `fused=True` (serving, quant='static_cal') runs the whole unit as
    one Pallas kernel (`ops/pallas_qconv.fused_rcu`): int8 convs with
    in-VMEM quantize and the BN affines folded into the dequant
    epilogues — the XLA chain's ~470 MB of HBM round-trips per RCU at
    the refinenet1 shape become one read + one write of x. Falls back
    per shape; calibration passes use the unfused path so the convs
    sow their activation amaxes."""

    features: int
    use_bn: bool = True
    dtype: Any = jnp.float32
    quant: Any = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (self.fused and self.quant == "static_cal" and not train
                and not self.is_mutable_collection("quant_cal")):
            from lseg_tpu.ops.pallas_qconv import (
                fold_bn_affine,
                fused_rcu,
                rcu_fusable,
            )
            n, hh, ww, cc = x.shape
            if rcu_fusable(hh, ww, cc) and cc == self.features:
                from lseg_tpu.ops.quant import QConvParams
                k1, sw1, b1, a1 = QConvParams(
                    self.features, (3, 3), use_bias=not self.use_bn,
                    static_act=True, name="conv1")(cc)
                k2, sw2, b2, a2 = QConvParams(
                    self.features, (3, 3), use_bias=not self.use_bn,
                    static_act=True, name="conv2")(cc)
                if self.use_bn:
                    g1, be1, m1, v1 = _BNStats(self.features,
                                               name="bn1")()
                    g2, be2, m2, v2 = _BNStats(self.features,
                                               name="bn2")()
                else:
                    g1 = be1 = m1 = v1 = None
                    g2 = be2 = m2 = v2 = None
                d1, e1 = fold_bn_affine(a1 / 127.0, sw1, g1, be1, m1,
                                        v1, conv_bias=b1)
                d2, e2 = fold_bn_affine(a2 / 127.0, sw2, g2, be2, m2,
                                        v2, conv_bias=b2)
                return fused_rcu(x, k1, d1, e1, 127.0 / a1,
                                 k2, d2, e2, 127.0 / a2)

        out = jax.nn.relu(x)
        out = _conv(
            self.features, (3, 3), self.quant, self.dtype, "conv1",
            padding=((1, 1), (1, 1)), use_bias=not self.use_bn,
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn1",
            )(out)
        out = jax.nn.relu(out)
        out = _conv(
            self.features, (3, 3), self.quant, self.dtype, "conv2",
            padding=((1, 1), (1, 1)), use_bias=not self.use_bn,
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn2",
            )(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: (+RCU1(skip)) -> RCU2 -> ×2 bilinear
    (align_corners=True) -> 1×1 out_conv
    (reference: lseg_blocks.py:293-358, _make_fusion_block lseg_net.py:94).

    `tail_fused=True` (serving, quant='static_cal' only) collapses the
    upsample -> quantize -> out_conv tail into one Pallas kernel
    (`ops/pallas_decoder.fused_upsample_outconv`) — at the refinenet1
    flagship shape that chain round-trips ~710 MB of HBM between two
    matmuls. With `out_int8_scale` set (the downstream consumer's
    calibrated activation scale) the block returns the consumer-ready
    int8 tensor instead of bf16 (callers detect this by dtype). During
    activation-scale calibration (`mutable=['quant_cal']`) the unfused
    path runs so `out_conv` sows its input amax.
    """

    features: int
    use_bn: bool = True
    dtype: Any = jnp.float32
    quant: Any = False
    tail_fused: bool = False
    rcu_fused: bool = False
    # Run out_conv BEFORE the x2 upsample (serving): the 1x1 conv is
    # channel-only and the bilinear upsample spatial-only, and the
    # align-corners interp rows sum to 1, so conv/bias and upsample
    # commute EXACTLY (up(conv(x)+b) == conv(up(x))+b up to float
    # reassociation). At the refinenet1 flagship shape this runs the
    # conv (and its activation quantize) on 4x fewer pixels and drops
    # one of the two int8 relayout copies at 240 res. Non-default: the
    # parity path keeps the reference op order (lseg_blocks.py:341-357).
    conv_first: bool = False
    # With conv_first: skip the trailing x2 upsample entirely and
    # return the LOW-RES conv output — the lowres-correlation serving
    # head pushes the upsample past the correlation matmul (linear
    # commute; models/lseg.py head_fused='lowres').
    skip_out_upsample: bool = False
    # Run the x2 interp matmuls over merged-dim rank-3 views (see
    # ops/resize.py collapse) — same arithmetic, targets the operand
    # relayout copies XLA inserts for the rank-4 einsum form.
    resize_collapse: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: jnp.ndarray | None = None,
        train: bool = False,
        out_int8_scale: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(
                self.features, self.use_bn, self.dtype, self.quant,
                self.rcu_fused, name="rcu1"
            )(skip, train)
        x = ResidualConvUnit(
            self.features, self.use_bn, self.dtype, self.quant,
            self.rcu_fused, name="rcu2"
        )(x, train)

        if self.conv_first:
            x = _conv(
                self.features, (1, 1), self.quant, self.dtype, "out_conv"
            )(x)
            if self.skip_out_upsample:
                return x
            return upsample2x(x, align_corners=True,
                              compute_dtype=(self.dtype
                                             if self.quant in
                                             ("static", "static_cal")
                                             else jnp.float32),
                              collapse=self.resize_collapse)

        if (self.tail_fused and self.quant == "static_cal"
                and not self.is_mutable_collection("quant_cal")):
            from lseg_tpu.ops.pallas_decoder import (
                fused_upsample_outconv,
                tail_fusable,
            )
            n, h, w, c = x.shape
            if tail_fusable(h, w, c, self.features):
                from lseg_tpu.ops.quant import QConvParams
                kq, sw, b, act = QConvParams(
                    self.features, (1, 1), use_bias=True,
                    static_act=True, name="out_conv",
                )(c)
                return fused_upsample_outconv(
                    x, kq, sw, b, act / 127.0,
                    out_scale=(None if out_int8_scale is None
                               else out_int8_scale),
                    out_int8=out_int8_scale is not None,
                )

        # the int8 serving decoder also runs the x2 bilinear in module
        # dtype (halves its streams); the parity path keeps fp32
        x = upsample2x(x, align_corners=True,
                       compute_dtype=(self.dtype
                                      if self.quant in ("static",
                                                        "static_cal")
                                      else jnp.float32),
                       collapse=self.resize_collapse)
        return _conv(
            self.features, (1, 1), self.quant, self.dtype, "out_conv"
        )(x)


class Scratch(nn.Module):
    """Four 3×3 no-bias convs projecting the reassembled pyramid to a
    common `features` width (reference: lseg_blocks.py:60-110)."""

    features: int
    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        return [
            _conv(
                self.features, (3, 3), self.quant, self.dtype,
                f"layer{i + 1}_rn", padding=((1, 1), (1, 1)),
                use_bias=False,
            )(layer)
            for i, layer in enumerate(layers)
        ]


def _activation(name: str):
    return {
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "tanh": jnp.tanh,
    }[name]


class DepthwiseHeadBlock(nn.Module):
    """Spatial regularization: one shared 3×3 single-channel conv applied
    depthwise over all K class channels (reference: lseg_net.py:29-58).
    arch_option=2 variant."""

    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, act: bool = True) -> jnp.ndarray:
        n, h, w, k = x.shape
        wkern = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, 1),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        # Shared weights across channels: broadcast the 1-channel kernel to
        # a depthwise conv; autodiff sums channel grads back to the shared
        # param, matching the reference's weight sharing.
        kern = jnp.tile(wkern.astype(x.dtype), (1, 1, 1, k))
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=k,
        ) + b.astype(x.dtype)
        if act:
            y = _activation(self.activation)(y)
        return y


class BottleneckHeadBlock(nn.Module):
    """arch_option=1 variant: adds a per-pixel channel-max residual
    (reference: lseg_net.py:61-79)."""

    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, act: bool = True) -> jnp.ndarray:
        n, h, w, k = x.shape
        maxres = jnp.max(x, axis=-1, keepdims=True)
        wkern = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, 1),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        kern = jnp.tile(wkern.astype(x.dtype), (1, 1, 1, k))
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=k,
        ) + b.astype(x.dtype)
        y = y + maxres
        if act:
            y = _activation(self.activation)(y)
        return y
