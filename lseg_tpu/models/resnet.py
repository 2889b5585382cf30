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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
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
        return jax.nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """4-stage ResNet returning the per-stage feature pyramid
    (strides 4, 8, 16, 32; channels 256..2048)."""

    cfg: ResNetConfig
    dtype: Any = jnp.float32

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
        planes = (64, 128, 256, 512)
        for stage, (n_blocks, p) in enumerate(zip(self.cfg.layers, planes)):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(
                p, stride=stride, downsample=True, dtype=self.dtype,
                name=f"layer{stage + 1}_block0",
            )(x, train)
            for b in range(1, n_blocks):
                x = Bottleneck(
                    p, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            outs.append(x)
        return outs
