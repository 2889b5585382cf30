"""VGG16 feature extractor — HSNet's third backbone
(reference: fewshot_data/model/hsnet.py:24-28 loads torchvision vgg16
with taps at feature indices [17, 19, 21, 24, 26, 28, 30];
extract_feat_vgg taps the OUTPUT of each listed module —
fewshot_data/model/base/feature.py:4-12 — i.e. conv outputs pre-relu
for 17..28 and the final maxpool output for 30).

Layout mirrors torchvision `vgg16().features` so checkpoints convert
index-for-index: conv indices (0,2,5,7,10,12,14,17,19,21,24,26,28),
maxpools after each stage.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg16 cfg 'D': (out_channels per conv, pool positions)
_VGG16_LAYOUT: Tuple = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512, "M",
)
HSNET_VGG_TAPS = (17, 19, 21, 24, 26, 28, 30)


class VGG16Features(nn.Module):
    """Runs the vgg16 feature stack, returning the outputs of the
    modules listed in `taps` (torchvision `features` indexing)."""

    taps: Sequence[int] = HSNET_VGG_TAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        idx = 0
        conv_i = 0
        taps = set(self.taps)
        for item in _VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in taps:
                    outs.append(x)
                idx += 1
            else:
                x = nn.Conv(
                    item, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"conv{idx}",
                )(x)
                conv_i += 1
                if idx in taps:  # conv output, pre-relu
                    outs.append(x)
                idx += 1
                x = jax.nn.relu(x)
                if idx in taps:
                    outs.append(x)
                idx += 1
        return outs


def convert_torchvision_vgg16(sd, prefix: str = "features."):
    """torchvision vgg16 state_dict -> VGG16Features params."""
    import numpy as np

    params = {}
    idx = 0
    for item in _VGG16_LAYOUT:
        if item == "M":
            idx += 1
            continue
        params[f"conv{idx}"] = {
            "kernel": sd[f"{prefix}{idx}.weight"]
            .transpose(2, 3, 1, 0).astype(np.float32),
            "bias": sd[f"{prefix}{idx}.bias"].astype(np.float32),
        }
        idx += 2  # conv + relu
    return params
