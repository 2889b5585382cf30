"""Per-label-set text-embedding cache.

The reference re-tokenizes and re-encodes the label list inside EVERY
forward — per window × scale × flip in the evaluator
(reference: modules/models/lseg_net.py:160-164, SURVEY.md §3.4 "known
inefficiency"). Here the text tower runs exactly once per distinct label
set; the image path takes the cached (K, C) matrix as a plain argument,
so label swaps never retrace the image network (the K dim is the only
shape change, giving one jit cache entry per distinct K).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.config import CLIPTextConfig
from lseg_tpu.models.clip_text import CLIPTextEncoder


class TextFeatureCache:
    """labelset (tuple of strings) -> (K, embed_dim) text features.

    The encode itself is jit'd once; K varies per label set but the text
    tower is cheap (K×77 tokens) relative to the image path.
    """

    def __init__(
        self,
        cfg: CLIPTextConfig,
        variables,
        tokenizer,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.variables = variables
        self.tokenizer = tokenizer
        self.encoder = CLIPTextEncoder(cfg, dtype=dtype)
        self._encode = jax.jit(self.encoder.apply)
        self._cache: Dict[Tuple[str, ...], jnp.ndarray] = {}

    def __call__(self, labels: Sequence[str]) -> jnp.ndarray:
        key = tuple(labels)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        tokens = jnp.asarray(self.tokenizer(list(labels)))
        feats = self._encode(self.variables, tokens)
        self._cache[key] = feats
        return feats

    def pair_features(self, label: str,
                      other: str = "others") -> jnp.ndarray:
        """ZS episode head: the ['others', <class>] binary pair
        (reference: lseg_net_zs.py:169-175)."""
        return self((other, label))


def encode_labels(
    cfg: CLIPTextConfig, variables, tokenizer, labels: Sequence[str]
) -> np.ndarray:
    """One-shot convenience (no cache)."""
    enc = CLIPTextEncoder(cfg)
    tokens = jnp.asarray(tokenizer(list(labels)))
    return np.asarray(jax.jit(enc.apply)(variables, tokens))
