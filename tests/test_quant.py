"""Int8 quantized matmul paths and fast-serving config: numerics and
model-level fidelity/drift bounds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.config import fast_serving
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.ops.quant import (
    QuantDense,
    StaticQuantDense,
    int8_matmul,
    quantize_rows,
    quantize_tree,
)
from lseg_tpu.testing import tiny_vit_config


def test_quantize_rows_exact_levels():
    x = jnp.asarray([[1.0, -0.5, 0.25, 0.0]])
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(float(s[0, 0]), 1.0 / 127.0)
    np.testing.assert_array_equal(
        np.asarray(q)[0], [127, -64, 32, 0]
    )


def test_int8_matmul_close_to_fp32():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 128).astype(np.float32)
    w = rng.randn(128, 96).astype(np.float32)
    ref = x @ w
    got = np.asarray(int8_matmul(
        jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32
    ))
    # ~1% relative error is the expected symmetric-int8 regime
    rel = np.abs(got - ref) / (np.abs(ref) + 1.0)
    assert rel.mean() < 0.02, rel.mean()


def test_quantdense_param_tree_matches_dense():
    import flax.linen as nn

    x = jnp.ones((2, 16))
    d = nn.Dense(8)
    q = QuantDense(8)
    vd = d.init(jax.random.PRNGKey(0), x)
    vq = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_map(
        lambda a: a.shape, vd
    ) == jax.tree_util.tree_map(lambda a: a.shape, vq)
    # same weights -> close outputs
    out_d = np.asarray(d.apply(vd, x))
    out_q = np.asarray(q.apply(vd, x).astype(jnp.float32))
    np.testing.assert_allclose(out_q, out_d, rtol=0.05, atol=0.05)


def test_quant_model_close_to_fp_model():
    cfg = tiny_vit_config()
    cfg_q = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, quant_int8=True)
    )
    m = LSegNet(cfg)
    mq = LSegNet(cfg_q)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    # identical param tree: the quant model consumes the same weights
    o = np.asarray(m.apply(v, x, txt))
    oq = np.asarray(mq.apply(v, x, txt))
    # cosine similarity of logits stays high under int8 noise
    cos = (o * oq).sum() / (
        np.linalg.norm(o) * np.linalg.norm(oq) + 1e-9
    )
    assert cos > 0.99, cos


def test_static_quant_dense_matches_dynamic():
    """StaticQuantDense on a quantize_tree'd fp32 kernel reproduces
    QuantDense (same quantization grid) bit-for-bit."""
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    vd = nn.Dense(24).init(jax.random.PRNGKey(0), x)
    # wrap the Dense params under an attn/qkv path so quantize_tree's
    # default leaf matcher fires
    tree = {"attn": {"qkv": vd["params"]}}
    qtree = quantize_tree(tree)
    assert qtree["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert qtree["attn"]["qkv"]["scale"].shape == (24,)
    out_dyn = QuantDense(24, dtype=jnp.float32).apply(vd, x)
    out_sta = StaticQuantDense(24, dtype=jnp.float32).apply(
        {"params": qtree["attn"]["qkv"]}, x
    )
    np.testing.assert_array_equal(np.asarray(out_dyn), np.asarray(out_sta))


def test_static_quant_model_from_quantize_tree():
    """End to end: init the fp32 model, quantize_tree the params, run
    the quant_int8='static' model — structure matches its own init and
    outputs track the fp32 model."""
    cfg = tiny_vit_config()
    cfg_s = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, quant_int8="static")
    )
    m = LSegNet(cfg)
    ms = LSegNet(cfg_s)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"])
    # serving tree structure == the static model's own init structure
    ref_shapes = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype),
        ms.init(jax.random.PRNGKey(0), x, txt)["params"],
    )
    got_shapes = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype), vq["params"]
    )
    assert ref_shapes == got_shapes
    o = np.asarray(m.apply(v, x, txt))
    oq = np.asarray(ms.apply(vq, x, txt))
    cos = (o * oq).sum() / (
        np.linalg.norm(o) * np.linalg.norm(oq) + 1e-9
    )
    assert cos > 0.99, cos
    agree = (o.argmax(-1) == oq.argmax(-1)).mean()
    assert agree > 0.97, agree


def test_fast_serving_config_drift_bounds():
    """The unified fast-serving config (bf16 scores + tanh GELU + bf16
    head): argmax label maps agree almost everywhere with the parity
    config on a random-init tiny model."""
    cfg = tiny_vit_config()
    cfg_f = fast_serving(cfg)
    assert cfg_f.vit.attn_scores_dtype == "bfloat16"
    assert cfg_f.vit.mlp_gelu == "tanh"
    assert cfg_f.head_dtype == "bfloat16"
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mf = LSegNet(cfg_f, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    a = np.asarray(m.apply(v, x, txt))
    b = np.asarray(mf.apply(v, x, txt))
    assert b.dtype == np.float32  # logits always emitted fp32
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, agree
    assert np.abs(a - b).max() < 0.5, np.abs(a - b).max()


def test_bf16_scores_close_to_fp32_scores():
    """The serving config's bf16 attention-score stream: argmax label
    maps should agree almost everywhere with the fp32-score model."""
    cfg = tiny_vit_config()
    cfg_b = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_scores_dtype="bfloat16")
    )
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mb = LSegNet(cfg_b, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    a = np.argmax(np.asarray(m.apply(v, x, txt)), -1)
    b = np.argmax(np.asarray(mb.apply(v, x, txt)), -1)
    assert (a == b).mean() > 0.98, (a == b).mean()


def test_tanh_gelu_drift_is_small():
    """Quantify the tanh-vs-erf GELU deviation at the model level (the
    ~12%-faster serving opt-in): argmax label maps should agree almost
    everywhere on a random-init tiny model."""
    cfg = tiny_vit_config()
    cfg_t = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, mlp_gelu="tanh")
    )
    m = LSegNet(cfg)
    mt = LSegNet(cfg_t)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    a = np.asarray(m.apply(v, x, txt))
    b = np.asarray(mt.apply(v, x, txt))
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, agree
    # logits stay close in absolute terms
    assert np.abs(a - b).max() < 0.5, np.abs(a - b).max()


def test_predictor_honors_head_dtype():
    """make_predictor's XLA head follows cfg.head_dtype (the fast
    serving config runs the correlate/upsample streams in bf16; the
    parity config in fp32) — label maps must agree on a tiny model."""
    from lseg_tpu.engine.serve import make_predictor

    cfg = tiny_vit_config()
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mf = LSegNet(fast_serving(cfg), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    a = np.asarray(make_predictor(m, v)(x, txt))
    b = np.asarray(make_predictor(mf, v)(x, txt))
    assert (a == b).mean() > 0.97, (a == b).mean()


def test_fast_serving_flashflat_drift():
    """fast_serving enables the flat-layout flash attention kernel for
    head_dim-64 models; its label maps must agree with the parity
    (XLA fp32) model. Runs the kernel in interpret mode on CPU."""
    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base, vit=dataclasses.replace(
            base.vit, embed_dim=128, num_heads=2))
    cfg_f = fast_serving(cfg)
    assert cfg_f.vit.attn_impl == "flashflat"
    # head_dim != 64 keeps the XLA fallback
    assert fast_serving(base).vit.attn_impl == "xla"

    m = LSegNet(cfg)
    mf = LSegNet(cfg_f, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    a = np.asarray(m.apply(v, x, txt))
    b = np.asarray(mf.apply(v, x, txt))
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, agree
    assert np.abs(a - b).max() < 0.5, np.abs(a - b).max()


def test_defer_pixel_norm_is_exact_reassociation():
    """correlate(defer_pixel_norm=True) == normalize-then-matmul up to
    fp rounding: (e/|e|)*t == (e*t)/|e|."""
    from lseg_tpu.ops.correlation import correlate

    rng = np.random.RandomState(0)
    e = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    t = jnp.asarray(rng.randn(5, 32).astype(np.float32))
    a = np.asarray(correlate(e, t, compute_dtype=jnp.float32))
    b = np.asarray(correlate(e, t, compute_dtype=jnp.float32,
                             defer_pixel_norm=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_static_quant_conv_matches_fp_conv():
    """StaticQuantConv on a quantize_tree'd nn.Conv kernel tracks the
    fp32 conv (symmetric-int8 error regime)."""
    import flax.linen as nn

    from lseg_tpu.ops.quant import StaticQuantConv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    conv = nn.Conv(24, (3, 3), padding=[(1, 1), (1, 1)])
    v = conv.init(jax.random.PRNGKey(0), x)
    # wrap under a path quantize_tree's decoder set matches
    tree = {"scratch": {"layer1_rn": v["params"]}}
    qtree = quantize_tree(tree, leaves=set(), decoder=True)
    qp = qtree["scratch"]["layer1_rn"]
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["scale"].shape == (24,)
    qconv = StaticQuantConv(24, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=jnp.float32)
    ref = np.asarray(conv.apply(v, x))
    got = np.asarray(qconv.apply({"params": qp}, x))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err


def test_decoder_quant_model_from_quantize_tree():
    """decoder_quant='static': quantize_tree(decoder=True) produces the
    exact tree the int8-decoder model expects, and outputs track the
    fp32-decoder model (same knob class as the other serving opt-ins)."""
    cfg = tiny_vit_config()
    cfg_q = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, quant_int8="static"),
        decoder_quant="static",
    )
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mq = LSegNet(cfg_q, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"], decoder=True)
    ref_shapes = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype),
        mq.init(jax.random.PRNGKey(0), x, txt)["params"],
    )
    got_shapes = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype), vq["params"]
    )
    assert ref_shapes == got_shapes
    o = np.asarray(m.apply(v, x, txt))
    oq = np.asarray(mq.apply(vq, x, txt))
    cos = (o * oq).sum() / (
        np.linalg.norm(o) * np.linalg.norm(oq) + 1e-9
    )
    assert cos > 0.99, cos
    agree = (o.argmax(-1) == oq.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_decoder_quant_composes_with_bn_fold():
    """Serving stack: fold BN -> quantize (vit + decoder) drops into a
    use_bn=False + decoder_quant='static' model."""
    from lseg_tpu.utils.fold_bn import fold_bn_tree

    cfg = tiny_vit_config()
    cfg_q = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, quant_int8="static"),
        decoder_quant="static",
        use_bn=False,
    )
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mq = LSegNet(cfg_q, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    folded = fold_bn_tree(v["params"], v.get("batch_stats"))
    vq = {"params": quantize_tree(folded, decoder=True)}
    o = np.asarray(m.apply(v, x, txt))
    oq = np.asarray(mq.apply(vq, x, txt))
    cos = (o * oq).sum() / (
        np.linalg.norm(o) * np.linalg.norm(oq) + 1e-9
    )
    assert cos > 0.99, cos
    agree = (o.argmax(-1) == oq.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_calibrated_act_scales():
    """decoder_quant='static_cal': calibration fills act_scale params
    via the quant_cal sow collection, and the calibrated model tracks
    the fp32-decoder model on the calibration distribution."""
    from lseg_tpu.ops.quant import calibrate_act_scales

    cfg = tiny_vit_config()
    cfg_q = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, quant_int8="static"),
        decoder_quant="static_cal",
    )
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    mq = LSegNet(cfg_q, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"], decoder=True,
                                 act_scale=True)
    # placeholder scale before calibration
    assert float(
        vq["params"]["refinenet1"]["rcu1"]["conv1"]["act_scale"]) == 1.0
    vq = calibrate_act_scales(mq, vq, x, None)
    sc = float(vq["params"]["refinenet1"]["rcu1"]["conv1"]["act_scale"])
    assert sc != 1.0 and sc > 0
    o = np.asarray(m.apply(v, x, txt))
    oq = np.asarray(mq.apply(vq, x, txt))
    agree = (o.argmax(-1) == oq.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_trained_model_fast_int8_miou_parity():
    """The decisive accuracy gate for the fast-serving stack (VERDICT
    r2: random-init argmax agreement is weak evidence — margins are
    near zero). Train the tiny head_dim-64 LSegNet to convergence on
    the synthetic set with the PARITY config (val mIoU ~0.85 on a
    held-out same-color slice), then evaluate the full bench.py
    fast-int8 stack (flashq fused attention kernel + tanh GELU + bf16
    deferred-norm fused head + static int8 projections and decoder
    with calibrated act scales, kernels in interpret mode on CPU)
    against the parity model: the mIoU delta must be small ON REAL
    MARGINS.

    Training notes (measured): the reference SGD+poly recipe cannot
    break the background-class collapse on this tiny task, and a
    16-image train set gets memorized via pos-embed (val mIoU 0.20);
    plain Adam 1e-3 over 128 images learns the color rule. Val images
    must come from the SAME dataset seed (class colors are drawn per
    seed). A half-trained model (600 steps, mIoU 0.80) shows LARGER
    int8 drift (delta 0.062, agreement 0.96) — the gate below is for
    the converged sharp-margin regime that matches real released
    checkpoints."""
    import os

    from lseg_tpu.data.synthetic import SyntheticSegDataset
    from lseg_tpu.ops.quant import calibrate_act_scales

    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base, vit=dataclasses.replace(base.vit, embed_dim=128,
                                      num_heads=2))
    nc = 4
    n_train = 128
    ds = SyntheticSegDataset(n=n_train + 8, size=64, num_classes=nc)

    def stack(lo, hi):
        return {
            "image": jnp.asarray(
                np.stack([ds[i]["image"] for i in range(lo, hi)])),
            "target": jnp.asarray(
                np.stack([ds[i]["target"] for i in range(lo, hi)])),
        }

    batches = [stack(i * 8, (i + 1) * 8) for i in range(n_train // 8)]
    # 4 val images keep the slow interpret-mode kernel forwards cheap
    # (16k pixels is plenty for the mIoU comparison)
    val = stack(n_train, n_train + 4)

    rng = np.random.RandomState(0)
    txt = jnp.asarray(rng.randn(nc, cfg.out_c).astype(np.float32))

    # The 1200-step CPU training run takes ~15 min, so the converged
    # checkpoint is a committed golden artifact (regenerate with
    # `python tests/make_golden.py --trained` after intentional
    # tiny-model changes — the miou_p > 0.7 gate below re-validates
    # convergence on every run either way).
    ckpt = os.path.join(os.path.dirname(__file__), "golden",
                        "trained_tiny.npz")
    if os.path.exists(ckpt):
        from lseg_tpu.testing import load_tree_npz

        trained = load_tree_npz(ckpt)
    else:
        # see test_half_trained_model_int8_drift_bound: goldens are
        # regenerated deliberately via tests/make_golden.py, never
        # silently inside a test run
        pytest.fail(
            f"committed golden checkpoint missing: {ckpt} — regenerate "
            "deliberately with `python tests/make_golden.py --trained` "
            "and review the parity numbers before committing"
        )

    def miou(pred, tgt):
        ious = []
        for c in range(nc):
            inter = ((pred == c) & (tgt == c)).sum()
            union = ((pred == c) | (tgt == c)).sum()
            if union:
                ious.append(inter / union)
        return float(np.mean(ious))

    tgt = np.asarray(val["target"])
    # parity serving model (the evaluate.py default: bf16 compute,
    # fp32 head, erf GELU, XLA attention)
    mp = LSegNet(cfg, dtype=jnp.bfloat16)
    pred_p = np.asarray(jnp.argmax(
        mp.apply(trained, val["image"], txt), -1))
    miou_p = miou(pred_p, tgt)

    # full fast-int8 stack, exactly as bench.py builds it
    cfg_f = fast_serving(cfg, quant="static_cal")
    assert cfg_f.vit.attn_impl == "flashlnq"
    assert cfg_f.vit.ln_quant_fused  # pin the exact bench.py stack
    assert cfg_f.vit.mlp_act_cal and cfg_f.vit.scan_unroll >= 8
    assert cfg_f.decoder_quant == "static_cal" and cfg_f.head_fused
    assert cfg_f.decoder_conv_first
    mf = LSegNet(cfg_f, dtype=jnp.bfloat16)
    vf = dict(trained)
    vf["params"] = quantize_tree(trained["params"], decoder=True,
                                 act_scale=True)
    vf = calibrate_act_scales(mf, vf, batches[0]["image"][:4], txt)
    pred_f = np.asarray(jnp.argmax(
        mf.apply(vf, val["image"], txt), -1))
    miou_f = miou(pred_f, tgt)

    agree = (pred_p == pred_f).mean()
    assert miou_p > 0.7, (miou_p, final_loss)
    assert agree > 0.97, (agree, miou_p, miou_f)
    assert abs(miou_p - miou_f) < 0.03, (miou_p, miou_f)

    # half-res-argmax serving mode (return_argmax=True: argmax at H/2
    # + nearest x2 instead of bilinear-upsample-then-argmax) on the
    # same fast stack: disagreements live only on class boundaries
    pred_a = np.asarray(mf.apply(vf, val["image"], txt,
                                 return_argmax=True))
    miou_a = miou(pred_a, tgt)
    agree_a = (pred_a == pred_f).mean()
    assert agree_a > 0.97, (agree_a, miou_f, miou_a)
    assert abs(miou_p - miou_a) < 0.03, (miou_p, miou_a)


def test_half_trained_model_int8_drift_bound():
    """Second gate on the fast-int8 stack (VERDICT r3 item 5): the
    HALF-trained tiny model (600 steps, val mIoU ~0.80 — soft margins)
    shows measurably larger int8 drift than the converged one (r3
    measured delta 0.062 / agreement 0.96 vs <0.03 / >0.97). This
    pins that soft-margin bound so a quantization regression cannot
    hide behind the converged gate's sharp margins. The quantified
    'calibrate per checkpoint' trigger table lives in
    docs/PERFORMANCE.md."""
    import os

    from lseg_tpu.data.synthetic import SyntheticSegDataset
    from lseg_tpu.ops.quant import calibrate_act_scales

    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base, vit=dataclasses.replace(base.vit, embed_dim=128,
                                      num_heads=2))
    nc, n_train = 4, 128
    ds = SyntheticSegDataset(n=n_train + 8, size=64, num_classes=nc)

    def stack(lo, hi):
        return {
            "image": jnp.asarray(
                np.stack([ds[i]["image"] for i in range(lo, hi)])),
            "target": jnp.asarray(
                np.stack([ds[i]["target"] for i in range(lo, hi)])),
        }

    cal = stack(0, 4)
    val = stack(n_train, n_train + 4)
    rng = np.random.RandomState(0)
    txt = jnp.asarray(rng.randn(nc, cfg.out_c).astype(np.float32))

    ckpt = os.path.join(os.path.dirname(__file__), "golden",
                        "trained_tiny_half.npz")
    if os.path.exists(ckpt):
        from lseg_tpu.testing import load_tree_npz

        trained = load_tree_npz(ckpt)
    else:
        # NEVER silently retrain + rewrite the committed golden here: a
        # regenerated checkpoint with different margins would shift the
        # pinned drift bound without any visible signal (advisor r4).
        pytest.fail(
            f"committed golden checkpoint missing: {ckpt} — regenerate "
            "deliberately with `python tests/make_golden.py --half` "
            "and review the drift numbers before committing"
        )

    def miou(pred, tgt):
        ious = []
        for c in range(nc):
            inter = ((pred == c) & (tgt == c)).sum()
            union = ((pred == c) | (tgt == c)).sum()
            if union:
                ious.append(inter / union)
        return float(np.mean(ious))

    tgt = np.asarray(val["target"])
    mp = LSegNet(cfg, dtype=jnp.bfloat16)
    pred_p = np.asarray(jnp.argmax(
        mp.apply(trained, val["image"], txt), -1))
    miou_p = miou(pred_p, tgt)
    # half-trained regime: learned the task but short of convergence
    assert 0.5 < miou_p < 0.92, miou_p

    cfg_f = fast_serving(cfg, quant="static_cal")
    mf = LSegNet(cfg_f, dtype=jnp.bfloat16)
    vf = dict(trained)
    vf["params"] = quantize_tree(trained["params"], decoder=True,
                                 act_scale=True)
    vf = calibrate_act_scales(mf, vf, cal["image"], txt)
    pred_f = np.asarray(jnp.argmax(
        mf.apply(vf, val["image"], txt), -1))
    miou_f = miou(pred_f, tgt)

    agree = (pred_p == pred_f).mean()
    # soft-margin bounds: the r3 measurement (delta 0.062, agreement
    # 0.96) with headroom; a regression past these means the int8
    # stack got meaningfully worse on realistic mid-training margins
    assert agree > 0.93, (agree, miou_p, miou_f)
    assert abs(miou_p - miou_f) < 0.09, (miou_p, miou_f)
