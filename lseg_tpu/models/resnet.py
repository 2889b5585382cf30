"""ResNet-101 image backbone (the `clip_resnet101` zero-shot variant).

The reference repackages a torchvision resnet101 into 4 stage modules
whose outputs feed the scratch/fusion decoder with channels
[256, 512, 1024, 2048] (reference: modules/models/lseg_vit_zs.py:742-761,
lseg_net_zs.py:300-339). Stage1 bundles the stem (conv7×7 s2, BN, relu,
maxpool 3×3 s2) with layer1.

NHWC layout; BN with running stats (cross-replica moments come free under
pjit's global-batch semantics — SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from lseg_tpu.config import ResNetConfig


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1×1 reduce -> 3×3 (stride here) -> 1×1
    expand ×4, BN after each conv, relu, identity/projection shortcut."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    # HSNet taps features BEFORE the final relu
    # (reference: fewshot_data/model/base/feature.py:28-46)
    with_prerelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = jax.nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="down_conv",
            )(x)
            identity = bn("down_bn")(identity)
        pre = out + identity
        post = jax.nn.relu(pre)
        return (post, pre) if self.with_prerelu else post


class ResNetBackbone(nn.Module):
    """4-stage ResNet returning the per-stage feature pyramid
    (strides 4, 8, 16, 32; channels 256..2048).

    `all_taps=True` additionally returns every bottleneck-block output
    (the HSNet feature-extraction mode, reference:
    fewshot_data/model/base/feature.py:4-24)."""

    cfg: ResNetConfig
    dtype: Any = jnp.float32
    all_taps: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> List[jnp.ndarray]:
        # Stem (reference stage1 head: lseg_vit_zs.py:751-761)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = jax.nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)),
            constant_values=-jnp.inf,
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        taps = []
        planes = (64, 128, 256, 512)
        for stage, (n_blocks, p) in enumerate(zip(self.cfg.layers, planes)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                block = Bottleneck(
                    p, stride=stride if b == 0 else 1,
                    downsample=(b == 0), dtype=self.dtype,
                    with_prerelu=self.all_taps,
                    name=f"layer{stage + 1}_block{b}",
                )
                if self.all_taps:
                    x, pre = block(x, train)
                    taps.append(pre)
                else:
                    x = block(x, train)
            outs.append(x)
        return taps if self.all_taps else outs
