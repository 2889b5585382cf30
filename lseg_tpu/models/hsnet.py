"""Hypercorrelation Squeeze Network (HSNet) — the reference's few-shot
baseline side-car (reference: fewshot_data/model/{hsnet.py,learner.py,
base/correlation.py,base/conv4d.py}), redesigned for TPU:

- channels-last 6-D hypercorrelation tensors (B, ha, wa, hb, wb, C);
- center-pivot 4-D convolutions expressed as two batched 2-D convs over
  the query / support planes (weights shared across the other plane by
  folding it into the batch dim — one XLA conv each, no Python loops);
- the frozen backbone's per-bottleneck pre-relu taps come from
  `ResNetBackbone(all_taps=True)` (feature.py:28-46 semantics);
- multi-layer cosine correlation with eps=1e-5 and relu clamp
  (correlation.py:8-29), grouped into the [layer4, layer3, layer2]
  pyramid by reversed-cumsum stack ids (hsnet.py:43).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lseg_tpu.config import ResNetConfig
from lseg_tpu.models.resnet import ResNetBackbone
from lseg_tpu.ops.resize import resize_bilinear


def multilayer_correlation(
    query_feats: Sequence[jnp.ndarray],   # each (B, ha, wa, C_l) NHWC
    support_feats: Sequence[jnp.ndarray],
    stack_sizes: Tuple[int, int, int],    # (#layer4, #layer3, #layer2)
) -> List[jnp.ndarray]:
    """Per-tap channel-normalized cosine correlations, relu-clamped,
    stacked channels-last into the 3-level pyramid
    (reference: base/correlation.py:8-29)."""
    eps = 1e-5
    corrs = []
    for qf, sf in zip(query_feats, support_feats):
        q = qf.astype(jnp.float32)
        s = sf.astype(jnp.float32)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)
        s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + eps)
        corr = jnp.einsum(
            "bijc,bklc->bijkl", q, s, preferred_element_type=jnp.float32
        )
        corrs.append(jnp.maximum(corr, 0.0))
    n4, n3, n2 = stack_sizes
    pyr4 = jnp.stack(corrs[-n4:], axis=-1)
    pyr3 = jnp.stack(corrs[-(n4 + n3): -n4], axis=-1)
    pyr2 = jnp.stack(corrs[-(n4 + n3 + n2): -(n4 + n3)], axis=-1)
    return [pyr4, pyr3, pyr2]


class CenterPivotConv4d(nn.Module):
    """conv1 over the query plane at stride-pruned support pivots +
    conv2 over the support plane per query pivot
    (reference: base/conv4d.py:7-58). x: (B, ha, wa, hb, wb, C)."""

    features: int
    kernel: int
    stride: int = 1  # support-plane stride (query plane is stride 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, ha, wa, hb, wb, c = x.shape
        k, s, f = self.kernel, self.stride, self.features
        pad = [(k // 2, k // 2)] * 2

        xp = x[:, :, :, ::s, ::s, :] if s > 1 else x
        hb2, wb2 = xp.shape[3], xp.shape[4]
        a = xp.transpose(0, 3, 4, 1, 2, 5).reshape(b * hb2 * wb2, ha, wa, c)
        a = nn.Conv(f, (k, k), padding=pad, dtype=self.dtype,
                    name="conv_query")(a)
        out1 = a.reshape(b, hb2, wb2, ha, wa, f).transpose(0, 3, 4, 1, 2, 5)

        v = x.reshape(b * ha * wa, hb, wb, c)
        v = nn.Conv(f, (k, k), strides=(s, s), padding=pad,
                    dtype=self.dtype, name="conv_support")(v)
        out2 = v.reshape(b, ha, wa, hb2, wb2, f)
        return out1 + out2


class BuildingBlock(nn.Module):
    """[CP4D -> GroupNorm(4) -> relu] x len(channels)
    (reference: learner.py:11-26)."""

    channels: Tuple[int, ...]
    kernels: Tuple[int, ...]
    strides: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (f, k, s) in enumerate(
            zip(self.channels, self.kernels, self.strides)
        ):
            x = CenterPivotConv4d(f, k, s, self.dtype,
                                  name=f"conv4d_{i}")(x)
            x = nn.GroupNorm(num_groups=4, dtype=self.dtype,
                             name=f"gn_{i}")(x)
            x = jax.nn.relu(x)
        return x


def _resize_query_dims(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear (align_corners=True) resize of the query plane (ha, wa)
    of a (B, ha, wa, hb, wb, C) tensor (reference: learner.py:49-55)."""
    b, ha, wa, hb, wb, c = x.shape
    flat = x.reshape(b, ha, wa, hb * wb * c)
    flat = resize_bilinear(flat, oh, ow, align_corners=True)
    return flat.reshape(b, oh, ow, hb, wb, c)


class HPNLearner(nn.Module):
    """Squeeze -> mix -> decode pyramid (reference: learner.py:7-85)."""

    in_channels: Tuple[int, int, int]  # (#layer4, #layer3, #layer2) taps
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray]) -> jnp.ndarray:
        o1, o2, o3 = 16, 64, 128
        sq4 = BuildingBlock((o1, o2, o3), (3, 3, 3), (2, 2, 2),
                            self.dtype, name="encoder_layer4")(pyramid[0])
        sq3 = BuildingBlock((o1, o2, o3), (5, 3, 3), (4, 2, 2),
                            self.dtype, name="encoder_layer3")(pyramid[1])
        sq2 = BuildingBlock((o1, o2, o3), (5, 5, 3), (4, 4, 2),
                            self.dtype, name="encoder_layer2")(pyramid[2])

        sq4 = _resize_query_dims(sq4, sq3.shape[1], sq3.shape[2])
        mix43 = BuildingBlock((o3, o3, o3), (3, 3, 3), (1, 1, 1),
                              self.dtype, name="encoder_layer4to3")(
            sq4 + sq3
        )
        mix43 = _resize_query_dims(mix43, sq2.shape[1], sq2.shape[2])
        mix432 = BuildingBlock((o3, o3, o3), (3, 3, 3), (1, 1, 1),
                               self.dtype, name="encoder_layer3to2")(
            mix43 + sq2
        )

        # collapse support dims, decode to a 2-channel mask
        enc = jnp.mean(mix432, axis=(3, 4))  # (B, ha, wa, C)
        x = nn.Conv(o3, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="decoder1_conv1")(enc)
        x = jax.nn.relu(x)
        x = nn.Conv(o2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="decoder1_conv2")(x)
        x = jax.nn.relu(x)
        up = x.shape[2] * 2  # square upsample keyed on W (learner.py:81)
        x = resize_bilinear(x, up, up, align_corners=True)
        x = nn.Conv(o2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="decoder2_conv1")(x)
        x = jax.nn.relu(x)
        return nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                       name="decoder2_conv2")(x)


class HSNet(nn.Module):
    """Full network: frozen backbone per-bottleneck taps -> masked
    support features -> hypercorrelation pyramid -> HPN learner ->
    full-res binary logits (reference: hsnet.py:16-66). Backbones:
    'resnet' (50/101 via cfg.layers) or 'vgg16' (reference
    hsnet.py:24-28, pyramid groups (1, 3, 3))."""

    resnet: ResNetConfig = ResNetConfig()  # (3, 4, 23, 3) = resnet101
    backbone: str = "resnet"
    dtype: Any = jnp.float32
    # reference --use_original_imgsize protocol (hsnet.py:55-58,
    # test.py:63): emit logits at the HPN learner's native resolution;
    # the caller resizes to each episode's ORIGINAL query size before
    # argmax (predict_mask_nshot org_size=...). Default False = resize
    # to the (square) network input size inside the model.
    use_original_imgsize: bool = False

    @property
    def stack_sizes(self) -> Tuple[int, int, int]:
        if self.backbone == "vgg16":
            return (1, 3, 3)
        l = self.resnet.layers
        return (l[3], l[2], l[1])

    @nn.compact
    def __call__(
        self,
        query_img: jnp.ndarray,     # (B, H, W, 3)
        support_img: jnp.ndarray,   # (B, H, W, 3)
        support_mask: jnp.ndarray,  # (B, H, W) {0,1}
    ) -> jnp.ndarray:
        if self.backbone == "vgg16":
            from lseg_tpu.models.vgg import VGG16Features

            net = VGG16Features(dtype=self.dtype, name="backbone")
            q_taps = net(query_img)
            s_taps = net(support_img)
        else:
            net = ResNetBackbone(
                self.resnet, dtype=self.dtype, all_taps=True,
                name="backbone",
            )
            q_taps = net(query_img)
            s_taps = net(support_img)
            # taps used: layers 2..4 only (feat_ids skips layer1,
            # reference hsnet.py:34-37 feat_ids=range(4, 34))
            skip = self.resnet.layers[0]
            q_taps, s_taps = q_taps[skip:], s_taps[skip:]

        # mask support features with the bilinearly-resized mask
        # (reference hsnet.py:62-66, align_corners=True)
        m = support_mask.astype(jnp.float32)[..., None]
        s_taps = [
            t * resize_bilinear(m, t.shape[1], t.shape[2],
                                align_corners=True).astype(t.dtype)
            for t in s_taps
        ]
        q_taps = [jax.lax.stop_gradient(t) for t in q_taps]
        s_taps = [jax.lax.stop_gradient(t) for t in s_taps]

        pyramid = multilayer_correlation(q_taps, s_taps, self.stack_sizes)
        logits = HPNLearner(self.stack_sizes, self.dtype,
                            name="hpn_learner")(pyramid)
        if self.use_original_imgsize:
            return logits
        h, w = query_img.shape[1], query_img.shape[2]
        return resize_bilinear(logits, h, w, align_corners=True)


def predict_mask_nshot(apply_fn, batch, nshot: int,
                       org_size=None) -> jnp.ndarray:
    """n-shot vote aggregation (reference: hsnet.py:68-90): sum the
    per-shot argmax masks, threshold at half the max vote.

    `org_size=(H, W)` is the use_original_imgsize protocol
    (reference: hsnet.py:72-75): each shot's logits are bilinearly
    resized (align_corners=True) to the episode's original query size
    before the argmax. The resize runs OUTSIDE the jitted apply_fn —
    original sizes vary per episode, so keeping them out of the model
    preserves one static program per input size."""
    agg = None
    for s in range(nshot):
        logits = apply_fn(
            batch["query_img"],
            batch["support_imgs"][:, s],
            batch["support_masks"][:, s],
        )
        if org_size is not None:
            logits = resize_bilinear(
                logits.astype(jnp.float32), org_size[0], org_size[1],
                align_corners=True,
            )
        vote = jnp.argmax(logits, axis=-1)
        agg = vote if agg is None else agg + vote
    if nshot == 1:
        return agg
    bsz = agg.shape[0]
    max_vote = jnp.maximum(
        jnp.max(agg.reshape(bsz, -1), axis=1), 1
    ).reshape(bsz, 1, 1)
    frac = agg.astype(jnp.float32) / max_vote
    return (frac >= 0.5).astype(jnp.int32)
