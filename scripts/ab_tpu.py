"""Interleaved A/B perf measurement on the real TPU.

The relayed v5e shows ±70% run-to-run variance across processes
(CLAUDE.md), so the ONLY trustworthy comparison is interleaved within
one process: compile every variant's (n=1, n=1+iters) fori_loop
programs up front, then alternate timed runs A, B, A, B, ... and
compare per-iteration slopes per repetition. Spread across reps < a few
% means the delta is real.

Usage: python scripts/ab_tpu.py [--batch=8] [--iters=12] [--reps=3]
       [--variants=base,int8]

Variants are defined in VARIANTS below; add new ones there.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lseg_tpu.config import fast_serving, get_config
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.ops.correlation import correlate
from lseg_tpu.ops.pallas_correlation import fused_correlate
from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax
from lseg_tpu.ops.quant import quantize_tree
from lseg_tpu.ops.resize import upsample2x
from lseg_tpu.utils.fold_bn import fold_bn_tree


def _default_fwd(model, cfg):
    def fwd(v, x, t):
        return jnp.argmax(model.apply(v, x, t), axis=-1)
    return fwd


def _mk(cfg_fn, prep=lambda v: v, fwd_fn=_default_fwd):
    def build():
        cfg = cfg_fn()
        model = LSegNet(cfg, dtype=jnp.bfloat16)
        return cfg, model, prep, fwd_fn(model, cfg)
    return build


def _cfg_base():
    return fast_serving(get_config("clip_vitl16_384"))


def _cfg_int8():
    return fast_serving(get_config("clip_vitl16_384"), quant="static")


def _cfg_flash():
    cfg = _cfg_base()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flash"))


def _cfg_bnfold():
    return dataclasses.replace(_cfg_base(), use_bn=False)


def _cfg_dpa():
    cfg = _cfg_base()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="dpa"))


def _cfg_flashflat():
    cfg = _cfg_base()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flashflat"))


def _cfg_flashflat_bq(bq):
    def f():
        cfg = _cfg_base()
        return dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, attn_block_q=bq))
    return f


def _cfg_flash2():
    cfg = _cfg_base()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flash2"))


def _prep_int8(v):
    # fast_serving(quant='static') now covers the decoder too
    return {**v, "params": quantize_tree(v["params"], decoder=True)}


def _cfg_int8_dec():
    # vit-only int8 (decoder left bf16) — the pre-adoption baseline
    return dataclasses.replace(_cfg_int8(), decoder_quant=False)


def _prep_int8_dec(v):
    return {**v, "params": quantize_tree(v["params"])}


def _cfg_int8_cal():
    return dataclasses.replace(_cfg_int8(), decoder_quant="static_cal")


def _prep_int8_cal(v):
    """Static calibrated activation scales: quantize with act_scale
    placeholders, then one calibration forward on the bench input."""
    from lseg_tpu.ops.quant import calibrate_act_scales

    cfg = _cfg_int8_cal()
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    vv = {**v, "params": quantize_tree(v["params"], decoder=True,
                                       act_scale=True)}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 480, 480, 3), jnp.float32)
    return calibrate_act_scales(model, vv, x, None)


def _cfg_int8_cfpp():
    # bench config + pre-resized pos-embed (pretrain_grid == 480/16)
    cfg = dataclasses.replace(_cfg_int8_lnq_lnf(),
                              decoder_conv_first=True)
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, pretrain_grid=30))


def _cfg_int8_mlpcal():
    cfg = dataclasses.replace(_cfg_int8_lnq_lnf(),
                              decoder_conv_first=True,
                              head_fused="lowres")
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, scan_unroll=8,
                                     mlp_act_cal=True))


def _prep_int8_mlpcal(v):
    """Static-cal quantize + calibration through the mlp_act_cal model
    (the block-level MLP-hidden amaxes must be sown by a model that
    declares them)."""
    from lseg_tpu.ops.quant import calibrate_act_scales

    cfg = _cfg_int8_mlpcal()
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    vv = {**v, "params": quantize_tree(v["params"], decoder=True,
                                       act_scale=True)}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 480, 480, 3), jnp.float32)
    return calibrate_act_scales(model, vv, x, None)


def _prep_int8_cal_pp(v):
    """presize_pos_embed for the 480 crop, then the usual static-cal
    quantize + calibration (through the presized model)."""
    from lseg_tpu.ops.quant import calibrate_act_scales

    from lseg_tpu.utils.checkpoint_convert import presize_pos_embed

    cfg0 = dataclasses.replace(_cfg_int8_lnq_lnf(),
                               decoder_conv_first=True)
    params, cfg = presize_pos_embed(v["params"], cfg0, 480, 480)
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    vv = {**v, "params": quantize_tree(params, decoder=True,
                                       act_scale=True)}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 480, 480, 3), jnp.float32)
    return calibrate_act_scales(model, vv, x, None)


def _cfg_int8_flashq():
    cfg = _cfg_int8_cal()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flashq"))


def _cfg_int8_flashqp():
    cfg = _cfg_int8_cal()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flashqp"))


def _cfg_int8_headf():
    cfg = _cfg_int8_flashq()
    return dataclasses.replace(cfg, head_fused=True)


def _fwd_headf_tailv2(model, cfg):
    """head-fused model emits half-res logits; the transpose-free
    Pallas upsample+argmax v2 kernel finishes the tail (full-res
    logits never in HBM)."""
    from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax_v2

    def fwd(v, x, t):
        lo = model.apply(v, x, t, return_halfres=True)
        return upsample2x_argmax_v2(lo)
    return fwd


def _fwd_headf_tailwh(model, cfg):
    """head-fused model emits half-res logits; the x2 output upsample
    runs W-interp FIRST (order='wh'). The profile shows a 0.65 ms
    relayout copy of the head kernel's (N,240,240,150) output feeding
    the H-interp matmul in the default 'hw' order — the other order may
    consume the kernel's native layout."""

    def fwd(v, x, t):
        lo = model.apply(v, x, t, return_halfres=True)
        up = upsample2x(lo, align_corners=True,
                        compute_dtype=jnp.bfloat16, order="wh")
        return jnp.argmax(up.astype(jnp.float32), axis=-1)
    return fwd


def _cfg_int8_headwup():
    cfg = _cfg_int8_flashq()
    return dataclasses.replace(cfg, head_fused="wup")


def _cfg_int8_sscan():
    cfg = _cfg_int8_headf()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, single_scan=True))


def _prep_int8_cal_sscan(v):
    # same as _prep_int8_cal but calibrates through the single-scan
    # model (the param tree lives under vit/segall)
    from lseg_tpu.ops.quant import calibrate_act_scales

    from lseg_tpu.utils.checkpoint_convert import segments_to_single_scan

    model = LSegNet(_cfg_int8_sscan(), dtype=jnp.bfloat16)
    vv = {**v, "params": quantize_tree(
        segments_to_single_scan(v["params"]), decoder=True,
        act_scale=True)}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 480, 480, 3), jnp.float32)
    return calibrate_act_scales(model, vv, x, None)


def _cfg_int8_tails():
    # fused upsample+quantize+out_conv decoder tails + int8 handoff to
    # the fused head (ops/pallas_decoder.fused_upsample_outconv)
    return dataclasses.replace(_cfg_int8_headf(),
                               decoder_fused_tail=True)


def _cfg_int8_frcu():
    # fused int8 RCU kernels on top of the fused tails
    return dataclasses.replace(_cfg_int8_tails(),
                               decoder_fused_rcu=True)


def _cfg_int8_frcu_only():
    # fused RCUs alone (isolate the two decoder kernels' contributions)
    return dataclasses.replace(_cfg_int8_headf(),
                               decoder_fused_rcu=True)


def _cfg_int8_lnq():
    # LN1 + per-row quantize fused INTO the flashq kernel (flashlnq) on
    # top of the headline int8_headf config
    cfg = _cfg_int8_headf()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="flashlnq"))


def _cfg_int8_lnf():
    # fused LN2+quantize Pallas pass on top of int8_headf (flashq)
    cfg = _cfg_int8_headf()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, ln_quant_fused=True))


def _cfg_int8_lnq_lnf():
    # both LN fusions: flashlnq attention + fused LN2+quantize — no
    # standalone LayerNorm left in the scan body
    cfg = _cfg_int8_lnq()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, ln_quant_fused=True))


def _cfg_int8_best_tails():
    # fused decoder tails on top of the double-LN-fused best config
    return dataclasses.replace(_cfg_int8_lnq_lnf(),
                               decoder_fused_tail=True)


def _cfg_int8_best_frcu():
    # fused RCU kernels + fused tails on top of the best config
    return dataclasses.replace(_cfg_int8_best_tails(),
                               decoder_fused_rcu=True)


def _cfg_int8_best_wup():
    # in-kernel x2 W-interp head variant on top of the best config
    return dataclasses.replace(_cfg_int8_lnq_lnf(), head_fused="wup")


def _cfg_int8_mlpf():
    cfg = _cfg_int8_flashq()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, mlp_fused=True))


def _cfg_int8_v2():
    cfg = _cfg_int8_cal()
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_variant="v2"))


def _cfg_int8_dec2():
    return dataclasses.replace(_cfg_int8(), decoder_quant="static",
                               use_bn=False)


def _prep_int8_dec2(v):
    p = fold_bn_tree(v["params"], v.get("batch_stats"))
    return {"params": quantize_tree(p, decoder=True)}


def _prep_bnfold(v):
    return {"params": fold_bn_tree(v["params"], v.get("batch_stats"))}


def _fwd_bf16_argmax(model, cfg):
    """argmax straight on the bf16 upsampled logits (convert to fp32 is
    monotonic, so the label map is identical) — skips the 1.1 GB fp32
    logit stream of the full-model path. Matches the adopted fast head
    (deferred pixel norm)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = correlate(emb, t, logit_scale=cfg.logit_scale,
                           compute_dtype=jnp.bfloat16,
                           defer_pixel_norm=True)
        up = upsample2x(logits, align_corners=True,
                        compute_dtype=jnp.bfloat16)
        return jnp.argmax(up, axis=-1)
    return fwd


def _fwd_pallas_head(model, cfg):
    """XLA correlate (temperature-folded, bf16) + Pallas streamed
    upsample+argmax (full-res logits never hit HBM)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = correlate(emb, t, logit_scale=cfg.logit_scale,
                           compute_dtype=jnp.bfloat16)
        return upsample2x_argmax(logits)
    return fwd


def _fwd_pallas_full(model, cfg):
    """Pallas fused correlate + Pallas streamed upsample+argmax."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = fused_correlate(emb, t, logit_scale=cfg.logit_scale)
        return upsample2x_argmax(logits)
    return fwd


def _fwd_defer_norm(model, cfg):
    """Deferred pixel-norm head: correlate on the RAW head1 output,
    scale logits by 1/|e| after (exact reassociation; avoids the
    normalized-embedding materialization)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = correlate(emb, t, logit_scale=cfg.logit_scale,
                           compute_dtype=jnp.bfloat16,
                           defer_pixel_norm=True)
        up = upsample2x(logits, align_corners=True,
                        compute_dtype=jnp.bfloat16)
        return jnp.argmax(up, axis=-1)
    return fwd


def _fwd_barrier_argmax(model, cfg):
    """Materialize the upsampled logits (optimization_barrier) so the
    argmax is a clean lane reduce instead of a loop fusion that
    recomputes the W-interp matmul per element (HLO:
    bitcast_reduce_fusion, 1.66 ms)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = correlate(emb, t, logit_scale=cfg.logit_scale,
                           compute_dtype=jnp.bfloat16,
                           defer_pixel_norm=True)
        up = upsample2x(logits, align_corners=True,
                        compute_dtype=jnp.bfloat16)
        up = jax.lax.optimization_barrier(up)
        return jnp.argmax(up, axis=-1)
    return fwd


def _fwd_fused_corr(model, cfg):
    """Pallas fused_correlate (bf16 interior): reads the 472 MB emb
    ONCE for norm+matmul (the XLA defer-norm path reads it twice —
    HLO: multiply_reduce_fusion + fusion.268)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = fused_correlate(emb, t, logit_scale=cfg.logit_scale,
                                 compute_dtype=jnp.bfloat16)
        up = upsample2x(logits, align_corners=True,
                        compute_dtype=jnp.bfloat16)
        return jnp.argmax(up, axis=-1)
    return fwd


def _fwd_int8_pallas_head(model, cfg):
    """int8 ViT + XLA bf16 correlate + Pallas streamed upsample+argmax
    (re-measure of the round-2 dead end now that the ViT is 2x faster
    and the head is a larger fraction)."""
    def fwd(v, x, t):
        emb = model.apply(v, x, None)
        logits = correlate(emb, t, logit_scale=cfg.logit_scale,
                           compute_dtype=jnp.bfloat16)
        return upsample2x_argmax(logits)
    return fwd


VARIANTS = {
    "base": _mk(_cfg_base),
    "int8": _mk(_cfg_int8, prep=_prep_int8),
    "int8_ph": _mk(_cfg_int8, prep=_prep_int8,
                   fwd_fn=_fwd_int8_pallas_head),
    "int8_cal_ph": _mk(_cfg_int8_cal, prep=_prep_int8_cal,
                       fwd_fn=_fwd_int8_pallas_head),
    "int8_cal_pf": _mk(_cfg_int8_cal, prep=_prep_int8_cal,
                       fwd_fn=_fwd_fused_corr),
    "int8_dn": _mk(_cfg_int8, prep=_prep_int8, fwd_fn=_fwd_defer_norm),
    "int8_vitonly": _mk(_cfg_int8_dec, prep=_prep_int8_dec),
    "int8_cal": _mk(_cfg_int8_cal, prep=_prep_int8_cal),
    "int8_v2": _mk(_cfg_int8_v2, prep=_prep_int8_cal),
    "int8_flashq": _mk(_cfg_int8_flashq, prep=_prep_int8_cal),
    "int8_mlpf": _mk(_cfg_int8_mlpf, prep=_prep_int8_cal),
    "int8_flashqp": _mk(_cfg_int8_flashqp, prep=_prep_int8_cal),
    "int8_headf": _mk(_cfg_int8_headf, prep=_prep_int8_cal),
    "int8_lnq": _mk(_cfg_int8_lnq, prep=_prep_int8_cal),
    "int8_lnf": _mk(_cfg_int8_lnf, prep=_prep_int8_cal),
    "int8_lnq_lnf": _mk(_cfg_int8_lnq_lnf, prep=_prep_int8_cal),
    "int8_hargmax": _mk(_cfg_int8_lnq_lnf, prep=_prep_int8_cal,
                        fwd_fn=lambda model, cfg: (
                            lambda v, x, t: model.apply(
                                v, x, t, return_argmax=True))),
    "int8_cf": _mk(lambda: dataclasses.replace(
                       _cfg_int8_lnq_lnf(), decoder_conv_first=True),
                   prep=_prep_int8_cal),
    "int8_cf_hargmax": _mk(lambda: dataclasses.replace(
                               _cfg_int8_lnq_lnf(),
                               decoder_conv_first=True),
                           prep=_prep_int8_cal,
                           fwd_fn=lambda model, cfg: (
                               lambda v, x, t: model.apply(
                                   v, x, t, return_argmax=True))),
    # lowres-correlation head: head1+correlate at H/4, upsample the
    # K-logit map, argmax at H/2 (exact linear commute; norm skipped,
    # argmax-invariant)
    "int8_cf_lowres": _mk(lambda: dataclasses.replace(
                              _cfg_int8_lnq_lnf(),
                              decoder_conv_first=True,
                              head_fused="lowres"),
                          prep=_prep_int8_cal,
                          fwd_fn=lambda model, cfg: (
                              lambda v, x, t: model.apply(
                                  v, x, t, return_argmax=True))),
    # + fully unrolled segment scans (no XLA while loop: no peel, no
    # per-iteration weight-slice copies; params stay stacked)
    "int8_cf_unroll": _mk(lambda: (lambda c: dataclasses.replace(
                              c, vit=dataclasses.replace(
                                  c.vit, scan_unroll=8)))(
                              dataclasses.replace(
                                  _cfg_int8_lnq_lnf(),
                                  decoder_conv_first=True,
                                  head_fused="lowres")),
                          prep=_prep_int8_cal,
                          fwd_fn=lambda model, cfg: (
                              lambda v, x, t: model.apply(
                                  v, x, t, return_argmax=True))),
    # + calibrated static MLP-hidden act scale (fc1 emits int8
    # directly; no bf16 hidden round trip / convert pass)
    "int8_cf_mlpcal": _mk(_cfg_int8_mlpcal, prep=_prep_int8_mlpcal,
                          fwd_fn=lambda model, cfg: (
                              lambda v, x, t: model.apply(
                                  v, x, t, return_argmax=True))),
    # + int8 QK inside the lnq kernel (per-row requantized q/k)
    "int8_cf_i8qk": _mk(lambda: (lambda c: dataclasses.replace(
                            c, vit=dataclasses.replace(
                                c.vit, attn_variant="i8qk")))(
                            dataclasses.replace(
                                _cfg_int8_lnq_lnf(),
                                decoder_conv_first=True)),
                        prep=_prep_int8_cal,
                        fwd_fn=lambda model, cfg: (
                            lambda v, x, t: model.apply(
                                v, x, t, return_argmax=True))),
    # + pre-resized pos-embed baked into the serving tree (480 crop)
    "int8_cfpp_hargmax": _mk(_cfg_int8_cfpp, prep=_prep_int8_cal_pp,
                             fwd_fn=lambda model, cfg: (
                                 lambda v, x, t: model.apply(
                                     v, x, t, return_argmax=True))),
    "int8_tails": _mk(_cfg_int8_tails, prep=_prep_int8_cal),
    "int8_best_tails": _mk(_cfg_int8_best_tails, prep=_prep_int8_cal),
    "int8_best_frcu": _mk(_cfg_int8_best_frcu, prep=_prep_int8_cal),
    "int8_best_wup": _mk(_cfg_int8_best_wup, prep=_prep_int8_cal),
    "int8_frcu": _mk(_cfg_int8_frcu, prep=_prep_int8_cal),
    "int8_frcuonly": _mk(_cfg_int8_frcu_only, prep=_prep_int8_cal),
    "int8_tailv2": _mk(_cfg_int8_headf, prep=_prep_int8_cal,
                       fwd_fn=_fwd_headf_tailv2),
    "int8_tailwh": _mk(_cfg_int8_headf, prep=_prep_int8_cal,
                       fwd_fn=_fwd_headf_tailwh),
    "int8_sscan": _mk(_cfg_int8_sscan, prep=_prep_int8_cal_sscan),
    "int8_headwup": _mk(_cfg_int8_headwup, prep=_prep_int8_cal),
    "int8_barrier": _mk(_cfg_int8_flashq, prep=_prep_int8_cal,
                        fwd_fn=_fwd_barrier_argmax),
    "int8_dec2": _mk(_cfg_int8_dec2, prep=_prep_int8_dec2),
    "flash": _mk(_cfg_flash),
    "bnfold": _mk(_cfg_bnfold, prep=_prep_bnfold),
    "dpa": _mk(_cfg_dpa),
    "flash2": _mk(_cfg_flash2),
    "flashflat": _mk(_cfg_flashflat),
    "ff_bq128": _mk(_cfg_flashflat_bq(128)),
    "ff_bq512": _mk(_cfg_flashflat_bq(512)),
    "ff_bq1024": _mk(_cfg_flashflat_bq(1024)),
    "int8_flash": _mk(
        lambda: dataclasses.replace(
            _cfg_int8(),
            vit=dataclasses.replace(_cfg_int8().vit, attn_impl="flash")),
        prep=_prep_int8),
    "bf16argmax": _mk(_cfg_base, fwd_fn=_fwd_bf16_argmax),
    "int8_bf16am": _mk(_cfg_int8, prep=_prep_int8,
                       fwd_fn=_fwd_bf16_argmax),
    "pallas_head": _mk(_cfg_base, fwd_fn=_fwd_pallas_head),
    "pallas_full": _mk(_cfg_base, fwd_fn=_fwd_pallas_full),
}


def _mk_attnvar(variant):
    """int8_cf_mlpcal with one flashlnq interior/grid variant swapped
    in (the catalogued tie/loss table lives in CLAUDE.md round 3-5)."""
    return _mk(lambda: (lambda c: dataclasses.replace(
                   c, vit=dataclasses.replace(
                       c.vit, attn_variant=variant)))(
                   _cfg_int8_mlpcal()),
               prep=_prep_int8_mlpcal,
               fwd_fn=lambda model, cfg: (
                   lambda v, x, t: model.apply(
                       v, x, t, return_argmax=True)))


# Flashlnq interior/grid variants on top of the mlp_act_cal config.
# NOTE: since fast_serving adopted attn_variant='quad' (round 5),
# int8_cf_mlpcal IS the quad grid — 'int8_cf_pair' pins the pre-r5
# pair-per-step grid so the adopted quad win stays re-measurable.
VARIANTS.update({
    f"int8_cf_{name}": _mk_attnvar(variant)
    for name, variant in (
        ("pair", "v1"),      # pair-per-step grid (pre-r5 default)
        ("lean", "lean"),    # scale fold + mask-bias row (tie)
        ("st", "st"),        # stage-separated heads (loss)
        ("leanst", "leanst"),
        ("lx2", "lx2"),      # lean + exp2 (tie)
        ("quad", "quad"),    # == int8_cf_mlpcal since adoption
        ("octo", "octo"),    # 4 pairs/step (tie vs quad)
        ("mono", "mono"),    # all pairs in one step (loss)
    )
})

# + merged-dim rank-3 interp matmuls in the refinenet upsamples
# (decoder_resize_collapse; targets the ~0.4 ms of operand relayout
# copies the round-5 HLO census found at the rank-4 einsum form)
VARIANTS["int8_cf_rcol"] = _mk(
    lambda: dataclasses.replace(_cfg_int8_mlpcal(),
                                decoder_resize_collapse=True),
    prep=_prep_int8_mlpcal,
    fwd_fn=lambda model, cfg: (
        lambda v, x, t: model.apply(v, x, t, return_argmax=True)))


def main() -> None:
    batch, iters, reps = 8, 12, 3
    names = ["base", "int8"]
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--iters="):
            iters = int(arg.split("=")[1])
        elif arg.startswith("--reps="):
            reps = int(arg.split("=")[1])
        elif arg.startswith("--variants="):
            names = arg.split("=")[1].split(",")

    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    # One fp32 init shared by all variants (identical weights -> any
    # throughput delta is the code path, not the data).
    cfg0, model0, _, _ = VARIANTS["base"]()
    txt = jax.random.normal(key, (150, cfg0.out_c), jnp.float32)
    v0 = jax.jit(model0.init)(key, x1, txt)

    runners = {}
    for name in names:
        cfg, model, prep, fwd = VARIANTS[name]()
        v = prep(dict(v0))

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(vv, xx, tt, n, fwd=fwd):
            def body(i, acc):
                xi = xx + (i.astype(jnp.float32) * 1e-6)
                return acc + jnp.sum(fwd(vv, xi, tt), dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        def timed(n, run=run, v=v):
            t0 = time.perf_counter()
            val = int(run(v, x, txt, n))
            assert val != -1
            return time.perf_counter() - t0

        # compile both program sizes now (cache-served if warm)
        t0 = time.perf_counter()
        timed(1)
        timed(1 + iters)
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        runners[name] = timed

    results = {n: [] for n in names}
    for rep in range(reps):
        t1 = {n: runners[n](1) for n in names}
        tn = {n: runners[n](1 + iters) for n in names}
        # second pass, reversed order, take min (guards one-off stalls)
        for n in reversed(names):
            t1[n] = min(t1[n], runners[n](1))
            tn[n] = min(tn[n], runners[n](1 + iters))
        for n in names:
            per = (tn[n] - t1[n]) / iters
            results[n].append(per)
            print(json.dumps({
                "rep": rep, "variant": n,
                "per_iter_ms": round(per * 1e3, 2),
                "img_per_sec": round(batch / per, 2),
            }), flush=True)

    print("# summary", flush=True)
    for n in names:
        best = min(results[n])
        print(json.dumps({
            "variant": n,
            "best_per_iter_ms": round(best * 1e3, 2),
            "best_img_per_sec": round(batch / best, 2),
            "all_ms": [round(p * 1e3, 1) for p in results[n]],
        }), flush=True)


if __name__ == "__main__":
    main()
