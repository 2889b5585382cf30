"""CLIP text encoder (OpenAI CLIP text transformer), pure JAX.

The reference loads the frozen OpenAI CLIP text tower and calls
`clip_pretrained.encode_text(tokens)` inside every forward
(reference: modules/models/lseg_net.py:183, lseg_vit.py:224). Here it is a
standalone flax module whose outputs are **cached per label set** (see
lseg_tpu/text/cache.py) — it runs once per label list, never in the hot
image path.

Architecture (CLIP text tower): token embedding -> learned positional
embedding -> L pre-norm transformer blocks with a causal mask and QuickGELU
(x * sigmoid(1.702x)) MLPs -> final LayerNorm -> take the activation at
each sequence's EOT token (argmax of token ids) -> linear projection to
the joint embedding dim.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lseg_tpu.config import CLIPTextConfig


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CausalSelfAttention(nn.Module):
    """MHA with additive causal mask (torch nn.MultiheadAttention
    semantics: fused in-projection, separate out-projection)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, d = x.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(x)
        qkv = qkv.reshape(n, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = hd ** -0.5
        attn = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        mask = jnp.tril(jnp.ones((t, t), dtype=bool))
        attn = jnp.where(mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "nhqk,nkhd->nqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(
            out.reshape(n, t, d)
        )


class TextBlock(nn.Module):
    """CLIP residual attention block: x += attn(ln_1(x));
    x += mlp(ln_2(x)) with QuickGELU. LayerNorm eps=1e-5 (torch default)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CausalSelfAttention(
            self.width, self.heads, self.dtype, name="attn"
        )(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)
        return x, None


class CLIPTextEncoder(nn.Module):
    """encode_text: (K, context_length) int32 tokens -> (K, embed_dim)."""

    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        k, t = tokens.shape
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
            jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
            jnp.float32,
        )
        x = tok_emb[tokens].astype(self.dtype)
        x = x + pos_emb[:t].astype(self.dtype)

        scan = nn.scan(
            TextBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.layers,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        x, _ = scan(
            width=cfg.width, heads=cfg.heads, dtype=self.dtype,
            name="resblocks",
        )(x, None)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        # Features at the EOT token (highest token id in CLIP's vocab).
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(k), eot]

        proj = self.param(
            "text_projection",
            nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim),
            jnp.float32,
        )
        return jnp.dot(
            x, proj.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)
