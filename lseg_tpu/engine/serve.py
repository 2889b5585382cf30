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


def make_labelset_sharded_predictor(
    model,
    variables,
    mesh,
    axis: str = "data",
) -> Callable:
    """Predictor for HUGE label sets: shards the correlation head over
    the label dimension K across `mesh`'s `axis`.

    The (N, H, W, K) logit volume is the memory/bandwidth bottleneck
    when K is large (FSS-1000: K≈1000 → ~1.8 GB at 480 crop, batch 8,
    fp32 — vs 512-d pixel embeddings at 0.24 GB): sharding K gives each
    device a (N, H, W, K/n) slice through the correlation matmul, the
    ×2 bilinear upsample (K-pointwise, so no halo exchange), and a
    local argmax; only the final (N, H, W) candidate index/value pair
    crosses the ICI for the global argmax. The backbone+decoder runs
    replicated — use the batch-sharded evaluators
    (`engine.eval_single`) when N ≥ device count instead; this
    predictor is the single-image / huge-K regime (SURVEY.md §2.3 SP
    row and §5 long-context notes: shard the correlation, all_gather
    only the reduced tiles).

    K must divide the axis size; pad the label list (and slice the
    returned map's semantics) or drop to `make_predictor` otherwise.
    Host-level callable (params are jit arguments, module docstring).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = model.cfg
    if cfg.arch_option in (1, 2):
        # the depthwise regularization blocks convolve ACROSS K with
        # shared weights; slicing K changes their receptive field's
        # channel count — keep those configs on the unsharded path
        raise ValueError(
            "arch_option 1/2 heads mix the K channels (depthwise "
            "blocks); label-set sharding does not apply")

    repl = NamedSharding(mesh, P())
    txt_sh = NamedSharding(mesh, P(axis, None))  # shard K rows
    out_sh = repl

    hd = (jnp.bfloat16 if cfg.head_dtype == "bfloat16"
          else jnp.float32)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, txt_sh),
        out_shardings=out_sh,
    )
    def _predict(variables, images, text_features):
        emb = model.apply(variables, images, None)  # (N, H/2, W/2, C)
        logits = correlate(emb, text_features,
                           logit_scale=cfg.logit_scale, compute_dtype=hd)
        up = upsample2x(logits, align_corners=True, compute_dtype=hd)
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    def predict(images, text_features):
        k = text_features.shape[0]
        n_dev = mesh.shape[axis]
        if k % n_dev:
            raise ValueError(
                f"label count {k} must divide the '{axis}' axis size "
                f"{n_dev} (pad the label list)")
        return _predict(variables, images, text_features)

    return predict


def make_data_sharded_predictor(
    model,
    variables,
    mesh,
    axis: str = "data",
) -> Callable:
    """Batch-sharded multi-chip serving: every device runs the FULL
    serving forward (incl. the fused Pallas kernels and the half-res
    argmax head) on its local batch shard via `shard_map` — by
    construction ZERO cross-device collectives, so img/s scales
    linearly per chip. This replaces the reference's replicate-module +
    one-thread-per-GPU eval dispatch
    (reference: additional_utils/models.py:183-248).

    Why shard_map and not plain jit-with-shardings: Pallas kernels are
    opaque custom calls to XLA's SPMD partitioner, which replicates
    them behind per-kernel all-gathers of the batch (census:
    tests/test_parallel.py::test_data_sharded_serving_has_no_collectives).
    shard_map sidesteps partitioning — the kernels trace at the LOCAL
    batch shape and never see the mesh.

    Batch must divide the axis size. Host-level callable; params are
    jit arguments (module docstring convention).
    """
    from jax.sharding import PartitionSpec as P

    repl, psh = P(), P(axis)

    def _local(v, x, t):
        return model.apply(v, x, t, return_argmax=True)

    pred_jit = jax.jit(jax.shard_map(
        _local, mesh=mesh, in_specs=(repl, psh, repl), out_specs=psh,
        check_vma=False,
    ))

    def predict(images, text_features):
        n, nd = images.shape[0], mesh.shape[axis]
        if n % nd:
            raise ValueError(
                f"batch {n} must divide the '{axis}' axis size {nd}")
        return pred_jit(variables, images, text_features)

    return predict
