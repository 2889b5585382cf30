"""Single-scale batched evaluator / serving forward.

The headline throughput path (BASELINE.json: 480×480 single-scale
zero-shot): images are batched at a fixed crop size, the whole batch is
one jit'd forward (optionally + horizontal-flip TTA), metrics update on
device, and only scalars / small label maps are fetched. Shards over the
`data` mesh axis when given a mesh — the TPU-native replacement for the
reference's one-image-per-GPU threaded DataParallel
(reference: additional_utils/models.py:183-248, test_lseg.py:435).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.ops.metrics import seg_update


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

        def logits_fn(images, text_features):
            out = apply_fn(images, text_features).astype(jnp.float32)
            if flip:
                out = out + apply_fn(
                    images[:, :, ::-1, :], text_features
                ).astype(jnp.float32)[:, :, ::-1, :]
            return out

        self._predict = jax.jit(
            lambda img, txt: jnp.argmax(
                logits_fn(img, txt), axis=-1
            ).astype(jnp.int32)
        )

        def metrics_fn(img, tgt, txt):
            return seg_update(
                logits_fn(img, txt), tgt, nclass=num_classes,
                ignore_index=ignore_index,
            )

        self._metrics = jax.jit(metrics_fn)

    def _shard(self, x):
        if self.mesh is None:
            return x
        from lseg_tpu.parallel import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh))

    def __call__(self, images, text_features) -> np.ndarray:
        return np.asarray(self._predict(self._shard(images), text_features))

    def metrics(self, images, targets, text_features):
        """(correct, labeled, inter, union) device arrays for streaming
        accumulation (feed to ops.metrics.SegmentationMetric buffers)."""
        return self._metrics(
            self._shard(images), self._shard(targets), text_features
        )
