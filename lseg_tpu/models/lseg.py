"""The LSeg model family — one parameterized flax module.

Unifies the reference's `LSegNet` / `LSegNetZS` / `LSegRNNetZS`
(reference: modules/models/lseg_net.py:104-226,
modules/models/lseg_net_zs.py:106-362) into a single network whose forward
takes **precomputed text features** instead of tokenizing inside the
forward pass — the key TPU design decision: label-set swaps never retrace
or re-encode (text features are cached per label set by
`lseg_tpu.text.cache`).

Forward (reference call stack SURVEY.md §3.5):
    taps   = DenseViT(x)                      # 4 tapped token sequences
    layers = Reassemble_i(taps_i)             # multi-res pyramid
    rn     = Scratch(layers)                  # common width
    path   = fusion4..fusion1 cascade          # H/32 -> H/2
    img    = head1(path1)                      # (N, H/2, W/2, out_c)
    out    = correlate(img, text)              # (N, H/2, W/2, K)
    out    = [head_block x block_depth]        # optional smoothing
    out    = x2 bilinear (align_corners=True)  # (N, H, W, K)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from lseg_tpu.config import LSegConfig
from lseg_tpu.models.blocks import (
    BottleneckHeadBlock,
    DepthwiseHeadBlock,
    FeatureFusionBlock,
    Reassemble,
    Scratch,
)
from lseg_tpu.models.resnet import ResNetBackbone
from lseg_tpu.models.vit import DenseViT
from lseg_tpu.ops.correlation import correlate
from lseg_tpu.ops.resize import upsample2x


def _nearest2x(pred: jnp.ndarray) -> jnp.ndarray:
    """×2 nearest upsample of an (N, H, W) int32 label map
    (out[i, j] = in[i // 2, j // 2], torch F.interpolate 'nearest')."""
    n, h, w = pred.shape
    pred = jnp.broadcast_to(pred[:, :, None, :, None], (n, h, 2, w, 2))
    return pred.reshape(n, 2 * h, 2 * w)


class _Head1Params(nn.Module):
    """Declares head1's StaticQuantConv param set (kernel_q, scale,
    bias[, act_scale]) without running the conv — the fused head kernel
    consumes the raw params. Named 'head1' so the tree is identical to
    the unfused path."""

    features: int
    static_act: bool = False

    @nn.compact
    def __call__(self, cin: int):
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (1, 1, cin, self.features), jnp.int8)
        sw = self.param("scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        act = (self.param("act_scale", nn.initializers.ones, (),
                          jnp.float32) if self.static_act else None)
        return kq, sw, b, act


class LSegNet(nn.Module):
    """Language-driven segmentation network (image tower + decoder + head).

    __call__(x, text_features, train=False) -> (N, H, W, K) fp32 logits.

    `text_features` is (K, out_c) from `CLIPTextEncoder` — computed once
    per label set outside jit and passed in, so arbitrary open-vocabulary
    label lists swap in without retracing (BASELINE.json north star).
    Pass `text_features=None` to get the raw (N, H/2, W/2, out_c) pixel
    embeddings instead (serving path caches these when sweeping many label
    sets over one image).
    """

    cfg: LSegConfig
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: Any = None
    emulate_fp16: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (N, H, W, 3), normalized
        text_features: Optional[jnp.ndarray] = None,  # (K, out_c)
        train: bool = False,
        return_halfres: bool = False,  # skip the x2 output upsample
        return_argmax: bool = False,   # half-res-argmax serving mode
    ) -> jnp.ndarray:
        # `return_argmax=True` returns (N, H, W) int32 class predictions
        # computed as argmax over K at HALF resolution, nearest-×2
        # upsampled to the crop size (or left half-res with
        # `return_halfres`). This is the half-res-argmax serving mode:
        # mathematically different from the reference's
        # bilinear-upsample-then-argmax (disagreements only at class
        # boundaries; quantified on a trained model in
        # tests/test_quant.py), and identical across the fused-kernel
        # and XLA paths. In the fused head it runs the argmax inside
        # the Pallas kernel, so the logit map never exists in HBM.
        cfg = self.cfg

        if cfg.is_vit:
            taps, grid = DenseViT(
                cfg.vit, dtype=self.dtype, remat=self.remat,
                remat_policy=self.remat_policy, name="vit"
            )(x)
            layers = [
                Reassemble(
                    out_channels=cfg.vit.post_channels[i],
                    resample=cfg.vit.resample[i],
                    vit_dim=cfg.vit.embed_dim,
                    readout=cfg.readout,
                    dtype=self.dtype,
                    quant=cfg.decoder_quant,
                    name=f"reassemble{i + 1}",
                )(taps[i], grid)
                for i in range(4)
            ]
        else:
            layers = ResNetBackbone(
                cfg.resnet, dtype=self.dtype, name="resnet"
            )(x, train)

        rn = Scratch(cfg.features, dtype=self.dtype,
                     quant=cfg.decoder_quant, name="scratch")(layers)

        q = cfg.decoder_quant
        tails = cfg.decoder_fused_tail
        frcu = cfg.decoder_fused_rcu
        rcol = cfg.decoder_resize_collapse
        path4 = FeatureFusionBlock(
            cfg.features, cfg.use_bn, self.dtype, q, tails, frcu,
            resize_collapse=rcol, name="refinenet4"
        )(rn[3], None, train)
        path3 = FeatureFusionBlock(
            cfg.features, cfg.use_bn, self.dtype, q, tails, frcu,
            resize_collapse=rcol, name="refinenet3"
        )(path4, rn[2], train)
        path2 = FeatureFusionBlock(
            cfg.features, cfg.use_bn, self.dtype, q, tails, frcu,
            resize_collapse=rcol, name="refinenet2"
        )(path3, rn[1], train)

        use_head_fused = (
            cfg.head_fused and q in ("static", "static_cal")
            and cfg.head_dtype == "bfloat16"
            and cfg.arch_option not in (1, 2)
            and not self.emulate_fp16
            and text_features is not None
            # during activation-scale calibration the unfused path runs
            # so head1's StaticQuantConv sows its input amax (the fused
            # path declares raw params and never sows — without this,
            # head1's act_scale stayed at its init value 1.0 and path1
            # saturated at +-1 on the serving quantize grid)
            and not self.is_mutable_collection("quant_cal")
        )
        head_sc = None
        if use_head_fused and q == "static_cal":
            # declare head1's params up front so refinenet1's fused
            # tail can emit int8 directly on head1's calibrated grid
            # (param tree is name-keyed; declaration order is free)
            kq, s1, b1, act_sc = _Head1Params(
                cfg.out_c, static_act=True, name="head1"
            )(cfg.features)
            head_sc = act_sc / 127.0

        # lowres-correlation serving head (head_fused='lowres', argmax
        # mode): refinenet1 returns its PRE-upsample conv output, the
        # head projects+correlates on 4x fewer pixels, and only the
        # (.., K) logit map is x2-upsampled before the argmax. The
        # upsample and the head matmuls commute exactly (both linear)
        # and the skipped per-pixel norm is argmax-invariant — but when
        # quantized, path1 is ROUNDED TO THE int8 GRID AT H/4 (before
        # the upsample) instead of H/2, so up(Q(x)) != Q(up(x)) is a
        # real additional approximation vs the standard fused argmax
        # head, on top of bf16 interp rounding. Gated like the other
        # fast-int8 knobs: label agreement >0.97 + trained-model mIoU
        # delta <0.03 (tests/test_pallas_ops.py, tests/test_quant.py).
        use_lowres_head = (
            use_head_fused and cfg.head_fused == "lowres"
            and cfg.decoder_conv_first and return_argmax
        )
        path1 = FeatureFusionBlock(
            cfg.features, cfg.use_bn, self.dtype, q, tails, frcu,
            conv_first=cfg.decoder_conv_first,
            skip_out_upsample=use_lowres_head,
            resize_collapse=rcol, name="refinenet1"
        )(path2, rn[0], train, out_int8_scale=head_sc)

        if use_head_fused:
            # int8 head1 projection + deferred-norm correlation in one
            # Pallas kernel — the pixel-embedding map never exists in
            # HBM (ops/pallas_correlation.head1_correlate_fused). Param
            # tree identical to the unfused head1 StaticQuantConv.
            from lseg_tpu.ops.pallas_correlation import (
                head1_correlate_fused,
                head1_correlate_wup_fused,
            )
            from lseg_tpu.ops.quant import quantize_tensor

            if head_sc is None:
                kq, s1, b1, act_sc = _Head1Params(
                    cfg.out_c, static_act=False, name="head1"
                )(path1.shape[-1])
            if path1.dtype == jnp.int8:
                # refinenet1's fused tail already quantized on head1's
                # calibrated grid
                xq8, sxs = path1, head_sc
            elif act_sc is not None:
                sxs = act_sc / 127.0
                if return_argmax and not use_lowres_head:
                    # transposed argmax kernel quantizes in-VMEM (same
                    # round/clip/divide sequence -> bit-identical label
                    # map); the (N, H, W, C) int8 copy never hits HBM
                    xq8 = path1
                else:
                    xq8 = jnp.clip(
                        jnp.round(path1.astype(jnp.float32) / sxs),
                        -127, 127).astype(jnp.int8)
            else:
                xq8, sxs = quantize_tensor(path1)
            if use_lowres_head:
                from lseg_tpu.ops.pallas_correlation import (
                    head1_correlate_fused,
                )

                s_lo = head1_correlate_fused(
                    xq8, sxs, kq, s1, b1, text_features,
                    logit_scale=cfg.logit_scale, normalize=False,
                )  # (N, H/4, W/4, K) raw e@Tn scores
                up = upsample2x(s_lo, align_corners=True,
                                compute_dtype=jnp.bfloat16)
                pred = jnp.argmax(up.astype(jnp.float32),
                                  axis=-1).astype(jnp.int32)
                return pred if return_halfres else _nearest2x(pred)
            if return_argmax:
                from lseg_tpu.ops.pallas_correlation import (
                    head1_correlate_argmax_fused_t,
                )

                pred = head1_correlate_argmax_fused_t(
                    xq8, sxs, kq, s1, b1, text_features,
                )
                return pred if return_halfres else _nearest2x(pred)
            if cfg.head_fused == "wup" and not return_halfres:
                # kernel also applies the x2 W-interp; only the
                # H-interp remains for XLA to loop-fuse into the
                # consumer (the serving argmax)
                from lseg_tpu.ops.resize import resize_bilinear

                out = head1_correlate_wup_fused(
                    xq8, sxs, kq, s1, b1, text_features,
                    logit_scale=cfg.logit_scale,
                )  # (N, H, 2W, K): resize below applies H only
                n_, h_, w2_, _ = out.shape
                return resize_bilinear(
                    out, 2 * h_, w2_, align_corners=True,
                    compute_dtype=jnp.bfloat16).astype(jnp.float32)
            out = head1_correlate_fused(
                xq8, sxs, kq, s1, b1, text_features,
                logit_scale=cfg.logit_scale,
            )
            if return_halfres:
                return out
            return upsample2x(out, align_corners=True,
                              compute_dtype=jnp.bfloat16
                              ).astype(jnp.float32)

        from lseg_tpu.models.blocks import _conv
        image_features = _conv(
            cfg.out_c, (1, 1), q, self.dtype, "head1"
        )(path1)

        if text_features is None:
            return image_features

        # head compute dtype: fp32 for parity; bf16 for the fast serving
        # config (halves the (N, H/2, W/2, K) logit streams; drift bounds
        # in tests/test_quant.py)
        hd = (jnp.bfloat16 if cfg.head_dtype == "bfloat16"
              else jnp.float32)
        out = correlate(
            image_features,
            text_features,
            logit_scale=cfg.logit_scale,
            emulate_fp16=self.emulate_fp16,
            compute_dtype=hd,
            # exact reassociation (e/|e|)·t == (e·t)/|e| that avoids
            # materializing the normalized embedding map — adopted for
            # the fast bf16 head (+2.8% measured); the fp32 parity
            # path keeps the reference's literal normalize-then-matmul
            # order for bit-level comparability.
            defer_pixel_norm=cfg.head_dtype == "bfloat16",
        )

        if cfg.arch_option in (1, 2):
            out = out.astype(jnp.float32)
            block_cls = (
                BottleneckHeadBlock if cfg.arch_option == 1
                else DepthwiseHeadBlock
            )
            head_block = block_cls(
                activation=cfg.activation, dtype=jnp.float32,
                name="head_block",
            )
            for _ in range(cfg.block_depth - 1):
                out = head_block(out, act=True)
            out = head_block(out, act=False)
            out = out.astype(hd)

        if return_argmax:
            # half-res-argmax serving semantics on the XLA path: same
            # label map as the fused kernel (argmax is invariant to the
            # positive per-pixel norm and temperature factors)
            pred = jnp.argmax(out.astype(jnp.float32),
                              axis=-1).astype(jnp.int32)
            return pred if return_halfres else _nearest2x(pred)
        if return_halfres:
            return out
        # Output head: ×2 bilinear to full crop resolution
        # (reference: lseg_net.py:219-221,203).
        return upsample2x(out, align_corners=True,
                          compute_dtype=hd).astype(jnp.float32)
