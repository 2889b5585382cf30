"""CLIPTextEncoder numeric parity vs a torch oracle built from the SAME
weights using torch's own primitives (nn.MultiheadAttention with a
causal mask, LayerNorm, QuickGELU) — the ops the reference's CLIP text
tower runs on (reference: modules/models/lseg_net.py:183)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from lseg_tpu.models.clip_text import CLIPTextEncoder
from lseg_tpu.testing import TINY_TEXT


def _torch_oracle(params, tokens, cfg):
    p = params["params"]
    x = torch.from_numpy(
        np.asarray(p["token_embedding"])
    )[torch.from_numpy(tokens.astype(np.int64))]
    x = x + torch.from_numpy(np.asarray(p["positional_embedding"]))[
        : tokens.shape[1]
    ]

    t = tokens.shape[1]
    causal = torch.full((t, t), float("-inf")).triu(1)

    blocks = p["resblocks"]
    for i in range(cfg.layers):
        def g(*path):
            node = blocks
            for q in path:
                node = node[q]
            return torch.from_numpy(np.asarray(node[i]))

        ln1 = torch.nn.functional.layer_norm(
            x, (cfg.width,), g("ln_1", "scale"), g("ln_1", "bias"),
            eps=1e-5,
        )
        mha = torch.nn.MultiheadAttention(
            cfg.width, cfg.heads, batch_first=True
        )
        with torch.no_grad():
            mha.in_proj_weight.copy_(g("attn", "in_proj", "kernel").T)
            mha.in_proj_bias.copy_(g("attn", "in_proj", "bias"))
            mha.out_proj.weight.copy_(g("attn", "out_proj", "kernel").T)
            mha.out_proj.bias.copy_(g("attn", "out_proj", "bias"))
            a, _ = mha(ln1, ln1, ln1, attn_mask=causal,
                       need_weights=False)
        x = x + a
        ln2 = torch.nn.functional.layer_norm(
            x, (cfg.width,), g("ln_2", "scale"), g("ln_2", "bias"),
            eps=1e-5,
        )
        h = torch.nn.functional.linear(
            ln2, g("c_fc", "kernel").T, g("c_fc", "bias")
        )
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        x = x + torch.nn.functional.linear(
            h, g("c_proj", "kernel").T, g("c_proj", "bias")
        )

    x = torch.nn.functional.layer_norm(
        x, (cfg.width,),
        torch.from_numpy(np.asarray(p["ln_final"]["scale"])),
        torch.from_numpy(np.asarray(p["ln_final"]["bias"])), eps=1e-5,
    )
    eot = tokens.argmax(axis=-1)
    x = x[torch.arange(tokens.shape[0]), torch.from_numpy(eot)]
    return (x @ torch.from_numpy(
        np.asarray(p["text_projection"])
    )).numpy()


def test_clip_text_matches_torch_mha():
    cfg = TINY_TEXT
    enc = CLIPTextEncoder(cfg)
    rng = np.random.RandomState(0)
    tokens = np.zeros((3, cfg.context_length), np.int32)
    for r in range(3):
        n = rng.randint(3, cfg.context_length - 1)
        tokens[r, 0] = 700          # sot-ish
        tokens[r, 1: n - 1] = rng.randint(1, 512, n - 2)
        tokens[r, n - 1] = 1000     # eot = max id in row
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    # non-trivial weights
    variables = jax.tree_util.tree_map(
        lambda a: np.asarray(
            jax.random.normal(jax.random.PRNGKey(a.size % 97), a.shape)
            * 0.05
        ).astype(np.float32),
        variables,
    )
    ours = np.asarray(enc.apply(variables, jnp.asarray(tokens)))
    ref = _torch_oracle(variables, tokens, cfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
