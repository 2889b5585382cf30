"""Single-scale batched evaluator / serving forward.

The headline throughput path (BASELINE.json: 480×480 single-scale
zero-shot): images are batched at a fixed crop size, the whole batch is
one jit'd forward (optionally + horizontal-flip TTA), metrics update on
device, and only scalars / small label maps are fetched. Shards over the
`data` mesh axis when given a mesh — the TPU-native replacement for the
reference's one-image-per-GPU threaded DataParallel
(reference: additional_utils/models.py:183-248, test_lseg.py:435).

`apply_fn` is a HOST-LEVEL callable (engine/serve.make_logits_fn):
its params are jit arguments inside it, so this evaluator composes it
with small jits for flip/argmax/metrics instead of re-jitting it
(re-jitting would inline the weights as constants — serve.py docstring).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.ops.metrics import seg_update


@jax.jit
def _flip_w(x):
    return x[:, :, ::-1, :]


@jax.jit
def _merge_flip(a, b):
    return a.astype(jnp.float32) + b.astype(jnp.float32)[:, :, ::-1, :]


@jax.jit
def _argmax(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class SingleScaleEvaluator:
    """__call__(images, text_features) -> (B, H, W) int32 label maps;
    `metrics(images, targets, text_features)` -> device metric tuple."""

    def __init__(
        self,
        apply_fn,
        num_classes: int,
        flip: bool = False,
        ignore_index: int = -1,
        mesh=None,
    ):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.mesh = mesh
        self.flip = flip
        self._apply = apply_fn
        self._seg_update = jax.jit(
            seg_update, static_argnames=("nclass", "ignore_index")
        )

    def _logits(self, images, text_features):
        out = self._apply(images, text_features)
        if self.flip:
            out = _merge_flip(
                out, self._apply(_flip_w(images), text_features)
            )
        return out

    def _shard(self, x):
        if self.mesh is None:
            return x
        from lseg_tpu.parallel import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh))

    def __call__(self, images, text_features) -> np.ndarray:
        return np.asarray(
            _argmax(self._logits(self._shard(images), text_features))
        )

    def metrics(self, images, targets, text_features):
        """(correct, labeled, inter, union) device arrays for streaming
        accumulation (feed to ops.metrics.SegmentationMetric buffers)."""
        logits = self._logits(self._shard(images), text_features)
        return self._seg_update(
            logits, self._shard(targets), nclass=self.num_classes,
            ignore_index=self.ignore_index,
        )
