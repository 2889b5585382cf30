"""Serving predictors: the open-vocabulary inference entry points.

`make_predictor` builds the jit'd image->label-map function used by the
app / demo / benchmark (reference: lseg_app.py request loop, SURVEY.md
§3.4). Text features come precomputed from `TextFeatureCache`, so
per-request label lists swap in with zero retracing (only K changes
shape, one compile per distinct K).

IMPORTANT convention: params are JIT ARGUMENTS, never closure captures.
A closure-captured variables tree becomes embedded constants — a
flagship checkpoint inlines ~1.2 GB into the program, which breaks (and
at best bloats) TPU compilation. Every function returned here calls an
inner jit with `variables` passed per call; callers must NOT wrap these
host-level functions in another jax.jit (that would re-inline the
closure as constants).

The XLA head (`use_pallas=False`, the default) computes identical
values through `ops.correlation.correlate` + matmul upsample + argmax —
the Pallas path is cross-checked against it in tests. Measured on v5e
(interleaved A/B, CLAUDE.md): XLA's own fusion of this head is FASTER
than the hand-written kernels at the 480-crop/K=150 size, so Pallas is
opt-in; the kernels remain for larger K / HW regimes and as the
streaming (no full-res logits in HBM) option.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from lseg_tpu.ops.correlation import correlate
from lseg_tpu.ops.pallas_correlation import fused_correlate
from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax
from lseg_tpu.ops.resize import upsample2x


def make_predictor(
    model,
    variables,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Callable:
    """(images (N,H,W,3) fp32, text_features (K,C)) -> (N,H,W) int32.
    Host-level callable; params are passed into the jit per call."""
    cfg = model.cfg

    @jax.jit
    def _predict(variables, images, text_features):
        if cfg.arch_option in (1, 2):
            # spatial-regularization head blocks sit between correlation
            # and upsample; run the full model forward (XLA head)
            out = model.apply(variables, images, text_features)
            return jnp.argmax(out, axis=-1).astype(jnp.int32)
        emb = model.apply(variables, images, None)  # (N, H/2, W/2, C)
        if use_pallas:
            logits = fused_correlate(
                emb, text_features, logit_scale=cfg.logit_scale,
                interpret=interpret,
            )
            return upsample2x_argmax(logits, interpret=interpret)
        # honor the config's head compute dtype (fast_serving -> bf16
        # streams; parity -> fp32), same policy as LSegNet's own head
        hd = (jnp.bfloat16 if cfg.head_dtype == "bfloat16"
              else jnp.float32)
        logits = correlate(emb, text_features,
                           logit_scale=cfg.logit_scale, compute_dtype=hd)
        up = upsample2x(logits, align_corners=True, compute_dtype=hd)
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    return functools.partial(_predict, variables)


def make_logits_fn(model, variables) -> Callable:
    """(images, text_features) -> (N, H, W, K) fp32 logits — the TTA
    evaluator's crop forward (full LSegNet.__call__ path, XLA head,
    since TTA sums logits across windows/scales before any argmax).
    Host-level callable (see module docstring); do not re-jit."""
    jfwd = jax.jit(model.apply)
    return functools.partial(jfwd, variables)
