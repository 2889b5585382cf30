"""Serving-time BatchNorm folding.

Eval-mode BatchNorm after a conv is a per-output-channel affine:
    bn(conv(x, W)) = conv(x, W * g/s) + (b - m * g/s),  s = sqrt(v + eps)
so the BN disappears into the conv kernel/bias. Folding shrinks the
decoder graph XLA has to schedule (the RCU conv fusions carry the BN
epilogues in the hot serving path) and is bit-equivalent in exact
arithmetic.

The folded tree drops into a model built with `use_bn=False` (whose RCU
convs then have a bias — exactly the structure folding produces;
reference RCU: lseg_blocks.py:222-290 with `bias=not bn`).

Usage:
    v = {"params": ..., "batch_stats": ...}    # use_bn=True tree
    params = fold_bn_tree(v["params"], v["batch_stats"])
    model = LSegNet(dataclasses.replace(cfg, use_bn=False), ...)
    model.apply({"params": params}, x, txt)
"""

from __future__ import annotations

from collections.abc import Mapping

import jax.numpy as jnp

_EPS = 1e-5  # flax nn.BatchNorm default, matches torch


def _fold_one(conv, bn_params, bn_stats):
    """Fold one BN {scale,bias}/{mean,var} into a conv {kernel[,bias]}.
    Conv kernel layout (kh, kw, in, out); BN acts on `out`."""
    g = jnp.asarray(bn_params["scale"], jnp.float32)
    b = jnp.asarray(bn_params["bias"], jnp.float32)
    m = jnp.asarray(bn_stats["mean"], jnp.float32)
    v = jnp.asarray(bn_stats["var"], jnp.float32)
    s = g / jnp.sqrt(v + _EPS)
    kernel = jnp.asarray(conv["kernel"], jnp.float32) * s
    bias = b - m * s
    if "bias" in conv:
        bias = bias + jnp.asarray(conv["bias"], jnp.float32) * s
    return {"kernel": kernel, "bias": bias}


def fold_bn_tree(params, batch_stats):
    """Fold every (convX, bnX) / (down_conv, down_bn) sibling pair found
    in `params` + `batch_stats` into a bias-carrying conv; BN params are
    removed. Modules without matching stats pass through unchanged."""

    def rec(p, s):
        if not isinstance(p, Mapping):
            return p
        out = {}
        for k, v in p.items():
            bn_key = None
            if k.startswith("conv") and f"bn{k[4:]}" in p:
                bn_key = f"bn{k[4:]}"
            elif k == "down_conv" and "down_bn" in p:
                bn_key = "down_bn"
            if (bn_key is not None and isinstance(s, Mapping)
                    and bn_key in s):
                out[k] = _fold_one(v, p[bn_key], s[bn_key])
            elif k.startswith("bn") or k == "down_bn":
                if isinstance(s, Mapping) and k in s:
                    continue  # folded away
                out[k] = v
            else:
                out[k] = rec(v, s.get(k, {}) if isinstance(s, Mapping)
                             else {})
        return out

    return rec(params, batch_stats or {})
