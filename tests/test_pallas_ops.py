"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lseg_tpu.ops.correlation import correlate
from lseg_tpu.ops.pallas_correlation import fused_correlate
from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax
from lseg_tpu.ops.resize import upsample2x


def test_fused_correlate_matches_xla():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))
    txt = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    ref = correlate(img, txt)
    got = fused_correlate(img, txt, tile_m=64, interpret=True)
    assert got.shape == ref.shape == (2, 8, 16, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_correlate_bf16_input():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 8, 8, 64)).astype(jnp.bfloat16)
    txt = jnp.asarray(rng.randn(3, 64).astype(np.float32))
    got = fused_correlate(img, txt, tile_m=64, interpret=True)
    ref = correlate(img.astype(jnp.float32), txt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.experimental
def test_upsample2x_argmax_matches_xla():
    rng = np.random.RandomState(2)
    # H not a multiple of the tile, K not a multiple of 128
    logits = jnp.asarray(rng.randn(2, 12, 16, 7).astype(np.float32))
    ref = jnp.argmax(upsample2x(logits, align_corners=True), axis=-1)
    got = upsample2x_argmax(logits, tile_o=8, interpret=True)
    assert got.shape == (2, 24, 32)
    # in-kernel fp32 interpolation weights vs the float64 host operator:
    # random logits can tie at the last ulp, so allow a vanishing
    # disagreement fraction (measured 99.99% on TPU at 240->480, K=150)
    agree = np.mean(np.asarray(got) == np.asarray(ref))
    assert agree >= 0.999, agree


@pytest.mark.experimental
def test_upsample2x_argmax_k_padding_masked():
    # all-negative logits: if padding lanes (zeros) leaked into the
    # argmax they would win — they must not
    logits = -jnp.ones((1, 8, 8, 3)) * jnp.asarray([3.0, 1.0, 2.0])
    got = upsample2x_argmax(logits, tile_o=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 1)


@pytest.mark.experimental
def test_serve_predictor_pallas_matches_xla():
    from lseg_tpu.engine.serve import make_predictor
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.testing import tiny_vit_config

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(5, cfg.out_c).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, txt)
    a = make_predictor(model, v, use_pallas=False)(x, txt)
    b = make_predictor(model, v, use_pallas=True, interpret=True)(x, txt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serve_predictor_arch_option_path():
    """arch_option 1/2 uses the full-model forward (head blocks sit
    between correlation and upsample)."""
    import dataclasses

    from lseg_tpu.engine.serve import make_predictor
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.testing import tiny_vit_config

    cfg = dataclasses.replace(tiny_vit_config(), arch_option=2,
                              block_depth=2)
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, txt)
    pred = make_predictor(model, v)(x, txt)
    ref = jnp.argmax(model.apply(v, x, txt), -1)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref))


@pytest.mark.experimental
def test_pallas_dense_residual_matches_xla():
    from lseg_tpu.ops.pallas_dense import dense_residual

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(70, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(96).astype(np.float32))
    r = jnp.asarray(rng.randn(70, 96).astype(np.float32))
    ref = np.asarray(x @ w + b + r)
    got = np.asarray(dense_residual(
        x, w, b, r, tile_m=32, out_dtype=jnp.float32, interpret=True
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # no-residual path
    got2 = np.asarray(dense_residual(
        x, w, b, tile_m=32, out_dtype=jnp.float32, interpret=True
    ))
    np.testing.assert_allclose(got2, np.asarray(x @ w + b),
                               rtol=1e-4, atol=1e-4)


def test_flash_attention_flat_matches_einsum():
    """The flat-layout flash kernel == the XLA einsum attention math
    (fp32 reference), incl. a ragged T (non-multiple of the q block)."""
    from lseg_tpu.ops.pallas_attention import flash_attention_flat

    rng = np.random.RandomState(0)
    n, t, h, hd = 2, 37, 4, 64
    d = h * hd
    qkv = jnp.asarray(rng.randn(n, t, 3 * d).astype(np.float32))
    scale = hd ** -0.5

    got = np.asarray(flash_attention_flat(
        qkv, num_heads=h, scale=scale, block_q=16, interpret=True))

    r = np.asarray(qkv).reshape(n, t, 3, h, hd)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    s = np.einsum("nqhd,nkhd->nhqk", q, k) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, d)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_flat_in_model():
    """attn_impl='flashflat' wires through Attention (needs head_dim
    64): same params as the xla impl, close outputs."""
    import dataclasses as dc

    from lseg_tpu.models.vit import Attention

    rng = np.random.RandomState(1)
    d, h = 128, 2
    x = jnp.asarray(rng.randn(2, 21, d).astype(np.float32))
    a_xla = Attention(d, h, impl="xla")
    v = a_xla.init(jax.random.PRNGKey(0), x)
    a_ff = Attention(d, h, impl="flashflat")
    o1 = np.asarray(a_xla.apply(v, x))
    # interpret mode on CPU via the kernel's jit static arg is not
    # reachable through the module; run the real lowering only when a
    # TPU is present, else compare in interpret mode at the op level
    if jax.default_backend() == "tpu":
        o2 = np.asarray(a_ff.apply(v, x))
        np.testing.assert_allclose(o1, o2, rtol=2e-2, atol=2e-2)
    else:
        from lseg_tpu.ops.pallas_attention import flash_attention_flat

        import flax.linen as nn
        qkv = nn.Dense(3 * d).apply(
            {"params": v["params"]["qkv"]}, x)
        out = flash_attention_flat(qkv, h, (d // h) ** -0.5,
                                   interpret=True)
        o2 = np.asarray(nn.Dense(d).apply(
            {"params": v["params"]["proj"]}, out))
        np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-4)


def test_flash_attention_flat_valid_len_masking():
    """Sequence padded to a sublane multiple with valid_len masking ==
    unpadded attention on the real tokens (pad keys excluded)."""
    from lseg_tpu.ops.pallas_attention import flash_attention_flat

    rng = np.random.RandomState(2)
    n, t, h, hd = 1, 29, 2, 64
    d = h * hd
    qkv = rng.randn(n, t, 3 * d).astype(np.float32)
    tp = 32
    qkv_pad = np.concatenate(
        [qkv, rng.randn(n, tp - t, 3 * d).astype(np.float32)], axis=1)
    scale = hd ** -0.5
    ref = np.asarray(flash_attention_flat(
        jnp.asarray(qkv), h, scale, block_q=16, interpret=True))
    got = np.asarray(flash_attention_flat(
        jnp.asarray(qkv_pad), h, scale, block_q=16, interpret=True,
        valid_len=t))
    np.testing.assert_allclose(got[:, :t], ref, rtol=1e-5, atol=1e-6)


def test_densevit_flashflat_pad_matches_xla():
    """DenseViT with flashflat pads T to a sublane multiple internally;
    taps must match the XLA path (same params)."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    # 64x48 image, patch 16 -> grid 4x3 -> T = 13 (pads to 16); hd 64
    cfg_x = dc.replace(base, embed_dim=128, num_heads=2)
    cfg_f = dc.replace(cfg_x, attn_impl="flashflat")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    m_x = DenseViT(cfg_x)
    m_f = DenseViT(cfg_f)
    v = m_x.init(jax.random.PRNGKey(0), x)
    taps_x, grid = m_x.apply(v, x)
    taps_f, grid_f = m_f.apply(v, x)
    assert grid == grid_f == (4, 3)
    for a, b in zip(taps_x, taps_f):
        assert a.shape == b.shape == (2, 13, 128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.experimental
def test_flash_attention_flat_v2_matches_v1():
    """Kernel interior variant v2 (stage-separated heads + exp2) is the
    same math as v1."""
    from lseg_tpu.ops.pallas_attention import flash_attention_flat

    rng = np.random.RandomState(3)
    n, t, h, hd = 2, 40, 4, 64
    d = h * hd
    qkv = jnp.asarray(rng.randn(n, t, 3 * d).astype(np.float32))
    scale = hd ** -0.5
    a = np.asarray(flash_attention_flat(qkv, h, scale, block_q=16,
                                        interpret=True))
    b = np.asarray(flash_attention_flat(qkv, h, scale, block_q=16,
                                        interpret=True, variant="v2"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_flashq_fused_qkv_matches_flashflat():
    """attn_impl='flashq' (int8 qkv projection fused into the flash
    kernel) matches the unfused static-int8 flashflat path on the same
    quantized tree — identical math, different fusion boundary."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    cfg_f = dc.replace(base, embed_dim=128, num_heads=2,
                       attn_impl="flashflat", quant_int8="static")
    cfg_q = dc.replace(cfg_f, attn_impl="flashq")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    m_f = DenseViT(cfg_f)
    m_q = DenseViT(cfg_q)
    # same fp32 init -> same quantized tree for both
    base_cfg = dc.replace(cfg_f, attn_impl="xla", quant_int8=False)
    v0 = DenseViT(base_cfg).init(jax.random.PRNGKey(0), x)
    vq = {"params": quantize_tree(v0["params"])}
    taps_f, grid_f = m_f.apply(vq, x)
    taps_q, grid_q = m_q.apply(vq, x)
    assert grid_f == grid_q
    # single-Attention agreement is bf16-rounding-level (~1e-2); over a
    # full stack the boundary rounding compounds, so assert direction
    # (cosine) per tap rather than elementwise closeness
    for a, b in zip(taps_f, taps_q):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, cos


def test_flashlnq_fused_ln_matches_flashq():
    """attn_impl='flashlnq' (LayerNorm + per-row int8 quantize + int8
    qkv projection + flash attention in one kernel) matches the flashq
    path (standalone LN + quantize_rows + fused qkv kernel) on the same
    quantized tree — identical math, LN moved inside the kernel."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    cfg_q = dc.replace(base, embed_dim=128, num_heads=2,
                       attn_impl="flashq", quant_int8="static")
    cfg_l = dc.replace(cfg_q, attn_impl="flashlnq")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    base_cfg = dc.replace(cfg_q, attn_impl="xla", quant_int8=False)
    v0 = DenseViT(base_cfg).init(jax.random.PRNGKey(0), x)
    vq = {"params": quantize_tree(v0["params"])}
    # identical param trees: the LN params are declared (not applied)
    # on the flashlnq path but keep nn.LayerNorm's names/shapes
    vl = DenseViT(cfg_l).init(jax.random.PRNGKey(0), x)
    vq0 = DenseViT(cfg_q).init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(vq0["params"])
            == jax.tree.structure(vl["params"]))
    taps_q, _ = DenseViT(cfg_q).apply(vq, x)
    taps_l, _ = DenseViT(cfg_l).apply(vq, x)
    for a, b in zip(taps_q, taps_l):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, cos


def test_ln_quantize_rows_matches_xla_chain():
    """ln_quantize_rows == quantize_rows(LayerNorm(x)) — same fp32
    math, so int8 values may differ only at round-to-nearest bin edges
    and scales must agree to fp tolerance."""
    import flax.linen as nn

    from lseg_tpu.ops.pallas_ln import ln_quantize_rows
    from lseg_tpu.ops.quant import quantize_rows

    rng = np.random.RandomState(0)
    n, t, d = 2, 16, 256
    x = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 3)
    g = jnp.asarray(rng.rand(d).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    ln = nn.LayerNorm(epsilon=1e-6)
    y = ln.apply({"params": {"scale": g, "bias": b}}, x)
    q_ref, s_ref = quantize_rows(y)
    q, s = ln_quantize_rows(x, g, b, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref.reshape(
        n, t, 1)), rtol=1e-5, atol=1e-7)
    same = (np.asarray(q) == np.asarray(q_ref)).mean()
    assert same > 0.999, same  # bin-edge flips only
    assert np.abs(np.asarray(q, np.int32)
                  - np.asarray(q_ref, np.int32)).max() <= 1


def test_ln_quant_fused_block_matches_unfused():
    """ViTConfig.ln_quant_fused (Pallas LN2+quantize pass + XLA int8
    MLP matmuls) matches the static Mlp path on the same quantized
    tree; param trees identical."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    cfg_u = dc.replace(base, embed_dim=128, num_heads=2,
                       attn_impl="flashq", quant_int8="static")
    cfg_f = dc.replace(cfg_u, ln_quant_fused=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    base_cfg = dc.replace(cfg_u, attn_impl="xla", quant_int8=False)
    v0 = DenseViT(base_cfg).init(jax.random.PRNGKey(0), x)
    vq = {"params": quantize_tree(v0["params"])}
    vf0 = DenseViT(cfg_f).init(jax.random.PRNGKey(0), x)
    vu0 = DenseViT(cfg_u).init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(vu0["params"])
            == jax.tree.structure(vf0["params"]))
    taps_u, _ = DenseViT(cfg_u).apply(vq, x)
    taps_f, _ = DenseViT(cfg_f).apply(vq, x)
    for a, b in zip(taps_u, taps_f):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, cos


@pytest.mark.experimental
def test_mlp_fused_matches_unfused():
    """mlp_fused=True (int8 fc1+GELU+requant+fc2+residual in one Pallas
    kernel) matches the unfused static-int8 path on the same tree."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    cfg_u = dc.replace(base, embed_dim=128, num_heads=2,
                       attn_impl="flashq", quant_int8="static",
                       mlp_gelu="tanh")
    cfg_f = dc.replace(cfg_u, mlp_fused=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    base_cfg = dc.replace(cfg_u, attn_impl="xla", quant_int8=False)
    v0 = DenseViT(base_cfg).init(jax.random.PRNGKey(0), x)
    vq = {"params": quantize_tree(v0["params"])}
    taps_u, _ = DenseViT(cfg_u).apply(vq, x)
    taps_f, _ = DenseViT(cfg_f).apply(vq, x)
    for a, b in zip(taps_u, taps_f):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, cos


@pytest.mark.experimental
def test_flashqp_fused_matches_flashq():
    """attn_impl='flashqp' (qkv + flash + int8 proj + residual in one
    kernel) tracks the flashq path on the same tree."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config().vit
    cfg_q = dc.replace(base, embed_dim=128, num_heads=2,
                       attn_impl="flashq", quant_int8="static")
    cfg_p = dc.replace(cfg_q, attn_impl="flashqp")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    base_cfg = dc.replace(cfg_q, attn_impl="xla", quant_int8=False)
    v0 = DenseViT(base_cfg).init(jax.random.PRNGKey(0), x)
    vq = {"params": quantize_tree(v0["params"])}
    taps_q, _ = DenseViT(cfg_q).apply(vq, x)
    taps_p, _ = DenseViT(cfg_p).apply(vq, x)
    for a, b in zip(taps_q, taps_p):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, cos


def test_head_fused_matches_unfused():
    """cfg.head_fused (int8 head1 + deferred-norm correlate in one
    kernel) tracks the unfused int8 head on the same tree."""
    import dataclasses

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg_u = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, quant_int8="static"),
        decoder_quant="static", head_dtype="bfloat16",
    )
    cfg_f = dataclasses.replace(cfg_u, head_fused=True)
    m_u = LSegNet(cfg_u, dtype=jnp.bfloat16)
    m_f = LSegNet(cfg_f, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, base.out_c).astype(np.float32))
    v = LSegNet(base, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"], decoder=True)
    a = np.asarray(m_u.apply(vq, x, txt), np.float32)
    b = np.asarray(m_f.apply(vq, x, txt), np.float32)
    assert a.shape == b.shape
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, agree
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.999, cos


@pytest.mark.experimental
def test_upsample2x_argmax_v2_matches_xla():
    from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax_v2

    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(2, 12, 16, 7).astype(np.float32))
    ref = jnp.argmax(upsample2x(logits, align_corners=True), axis=-1)
    got = upsample2x_argmax_v2(logits, tile_o=8, interpret=True)
    assert got.shape == (2, 24, 32)
    agree = np.mean(np.asarray(got) == np.asarray(ref))
    assert agree >= 0.999, agree
    # bf16 input path (the serving head's dtype)
    got_b = upsample2x_argmax_v2(logits.astype(jnp.bfloat16), tile_o=8,
                                 interpret=True)
    agree_b = np.mean(np.asarray(got_b) == np.asarray(ref))
    assert agree_b >= 0.99, agree_b


@pytest.mark.experimental
def test_head_wup_matches_head_fused_model():
    """head_fused='wup' (in-kernel W-interp + XLA H-interp tail) must
    match head_fused=True (kernel + full XLA x2 upsample) at the model
    level — same params, full-res logits."""
    import dataclasses

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg_f = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, quant_int8="static"),
        decoder_quant="static", head_dtype="bfloat16", head_fused=True,
    )
    cfg_w = dataclasses.replace(cfg_f, head_fused="wup")
    m_f = LSegNet(cfg_f, dtype=jnp.bfloat16)
    m_w = LSegNet(cfg_w, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, base.out_c).astype(np.float32))
    v = LSegNet(base, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"], decoder=True)
    a = np.asarray(m_f.apply(vq, x, txt), np.float32)
    b = np.asarray(m_w.apply(vq, x, txt), np.float32)
    assert b.shape == a.shape
    # identical math, different interp order/rounding (bf16)
    np.testing.assert_allclose(a, b, rtol=0.03, atol=0.03)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.98


def test_flashflat_vjp_grads_match_xla_attention():
    """flash_attention_flat_vjp (Pallas backward) must produce the
    same model gradients as the XLA attention path, including under
    sublane padding (pad rows carry exactly zero grad). Differentiates
    the BACKBONE only — the decoder/head backward is byte-identical
    between the two configs, so compiling it twice buys nothing
    (249s -> ~2x faster on a 1-CPU host)."""
    import dataclasses as dc

    from lseg_tpu.models.vit import DenseViT
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg_x = dc.replace(base.vit, embed_dim=128, num_heads=2)
    cfg_f = dc.replace(cfg_x, attn_impl="flashflat")
    m_x = DenseViT(cfg_x)
    m_f = DenseViT(cfg_f)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    v = m_x.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(params):
            taps, _ = model.apply({"params": params}, x)
            return sum(jnp.sum(t * t) for t in taps) * 1e-3
        return f

    gx = jax.grad(loss(m_x))(v["params"])
    gf = jax.grad(loss(m_f))(v["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_leaves_with_path(gf)}
    for path, lx in flat_x:
        lf = flat_f[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(lx), np.asarray(lf), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.experimental
def test_fused_upsample_outconv_matches_xla_chain():
    """fused_upsample_outconv == upsample2x(bf16) -> quantize ->
    int8 1x1 conv, across multi-band grids (halo rows) and both output
    modes (bf16 / consumer-grid int8)."""
    from lseg_tpu.ops.pallas_decoder import (
        fused_upsample_outconv,
        tail_fusable,
    )
    from lseg_tpu.ops.quant import int8_conv_prequant

    rng = np.random.RandomState(1)
    n, h, w, c, co = 2, 20, 16, 128, 128
    assert tail_fusable(h, w, c, co)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    wq = jnp.asarray(
        rng.randint(-127, 128, (1, 1, c, co)), jnp.int8)
    sw = jnp.asarray(rng.rand(co) * 0.01 + 1e-3, jnp.float32)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    s_in = jnp.float32(float(jnp.max(jnp.abs(
        x.astype(jnp.float32)))) / 127.0)

    # reference XLA chain (the current decoder_quant='static_cal' path)
    u = upsample2x(x, align_corners=True, compute_dtype=jnp.bfloat16)
    ref = int8_conv_prequant(
        u, wq, sw, padding=((0, 0), (0, 0)), out_dtype=jnp.bfloat16,
        act_scale=s_in)

    got = fused_upsample_outconv(x, wq, sw, b * 0, s_in,
                                 interpret=True)
    assert got.shape == (n, 2 * h, 2 * w, co) and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)

    # bias + int8 emission on the consumer grid
    s_out = jnp.float32(
        float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                              + b.astype(jnp.float32)))) / 127.0)
    got8 = fused_upsample_outconv(x, wq, sw, b, s_in, out_scale=s_out,
                                  out_int8=True, interpret=True)
    ref8 = jnp.clip(jnp.round(
        (ref.astype(jnp.float32) + b.astype(jnp.float32)) / s_out),
        -127, 127).astype(jnp.int8)
    assert got8.dtype == jnp.int8
    agree = (np.asarray(got8) == np.asarray(ref8)).mean()
    assert agree > 0.98, agree  # off-by-one rounding at bin edges only


@pytest.mark.experimental
def test_decoder_fused_tail_model_parity():
    """decoder_fused_tail=True (fused upsample+quantize+out_conv Pallas
    tails + int8 handoff to the fused head) matches the XLA
    static_cal decoder on a tiny shape-eligible model."""
    import dataclasses as dc

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import calibrate_act_scales, quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config(
        features=128, out_c=128, head_dtype="bfloat16",
        decoder_quant="static_cal", head_fused=True)
    cfg_a = base
    cfg_b = dc.replace(base, decoder_fused_tail=True)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(5, base.out_c).astype(np.float32))

    m_a = LSegNet(cfg_a, dtype=jnp.bfloat16)
    m_b = LSegNet(cfg_b, dtype=jnp.bfloat16)
    v = m_a.init(jax.random.PRNGKey(0), x, txt)
    v = dict(v)
    v["params"] = quantize_tree(v["params"], leaves=set(),
                                decoder=True, act_scale=True)
    v = calibrate_act_scales(m_a, v, x, None)

    out_a = np.asarray(m_a.apply(v, x, txt), np.float32)
    out_b = np.asarray(m_b.apply(v, x, txt), np.float32)
    assert out_a.shape == out_b.shape
    # int8 bin-edge flips at the tail handoff bound the drift
    agree = (out_a.argmax(-1) == out_b.argmax(-1)).mean()
    assert agree > 0.97, agree
    np.testing.assert_allclose(out_a, out_b, rtol=0.1, atol=0.1)

    # + fused RCU kernels (BN affines folded into dequant epilogues)
    cfg_c = dc.replace(base, decoder_fused_tail=True,
                       decoder_fused_rcu=True)
    m_c = LSegNet(cfg_c, dtype=jnp.bfloat16)
    out_c = np.asarray(m_c.apply(v, x, txt), np.float32)
    agree_c = (out_a.argmax(-1) == out_c.argmax(-1)).mean()
    assert agree_c > 0.97, agree_c
    np.testing.assert_allclose(out_a, out_c, rtol=0.12, atol=0.12)


@pytest.mark.experimental
def test_fused_rcu_matches_int8_chain():
    """fused_rcu == relu -> q(s1) -> conv1 -> bn1 -> relu -> q(s2) ->
    conv2 -> bn2 -> +x with calibrated static scales (the XLA
    static_cal RCU), including multi-band halos and image-edge zero
    padding."""
    from lseg_tpu.ops.pallas_qconv import fold_bn_affine, fused_rcu
    from lseg_tpu.ops.quant import int8_conv_prequant

    rng = np.random.RandomState(7)
    n, h, w, c = 2, 16, 16, 128
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    w1 = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)), jnp.int8)
    w2 = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)), jnp.int8)
    sw1 = jnp.asarray(rng.rand(c) * 2e-3 + 1e-4, jnp.float32)
    sw2 = jnp.asarray(rng.rand(c) * 2e-3 + 1e-4, jnp.float32)
    bn = lambda: (jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                  jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                  jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                  jnp.asarray(rng.rand(c) + 0.5, jnp.float32))
    g1, b1, m1, v1 = bn()
    g2, b2, m2, v2 = bn()

    s1 = jnp.float32(float(jnp.max(jnp.abs(
        jnp.maximum(x.astype(jnp.float32), 0)))) / 127.0)

    def bn_aff(y, g, bta, m, vv):
        a = g * jax.lax.rsqrt(vv + 1e-5)
        return y.astype(jnp.float32) * a + (bta - m * a)

    # reference chain (fp32 elementwise, int8 convs — the kernel's own
    # arithmetic order; the model-level bf16 drift is covered by the
    # decoder parity test)
    h1 = int8_conv_prequant(
        jnp.maximum(x.astype(jnp.float32), 0), w1, sw1,
        padding=((1, 1), (1, 1)), out_dtype=jnp.float32, act_scale=s1)
    h1 = jnp.maximum(bn_aff(h1, g1, b1, m1, v1), 0)
    s2 = jnp.float32(float(jnp.max(jnp.abs(h1))) / 127.0)
    h2 = int8_conv_prequant(
        h1, w2, sw2, padding=((1, 1), (1, 1)),
        out_dtype=jnp.float32, act_scale=s2)
    ref = (bn_aff(h2, g2, b2, m2, v2)
           + x.astype(jnp.float32)).astype(jnp.bfloat16)

    d1, e1 = fold_bn_affine(s1, sw1, g1, b1, m1, v1)
    d2, e2 = fold_bn_affine(s2, sw2, g2, b2, m2, v2)
    got = fused_rcu(x, w1, d1, e1, 1.0 / s1, w2, d2, e2, 1.0 / s2,
                    rows=8, interpret=True)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.05)


def test_head1_argmax_kernel_matches_fused():
    """head1_correlate_argmax_fused == argmax of head1_correlate_fused
    on the same operands (the skipped norm/temperature factors are
    positive and cannot change the winner), including K-pad masking
    with all-negative real logits."""
    from lseg_tpu.ops.pallas_correlation import (
        head1_correlate_argmax_fused,
        head1_correlate_fused,
    )

    rng = np.random.RandomState(3)
    n, h, w, c, e, k = 2, 8, 16, 32, 24, 5
    xq = jnp.asarray(
        rng.randint(-127, 128, size=(n, h, w, c)).astype(np.int8))
    sx = jnp.float32(0.037)
    w1q = jnp.asarray(
        rng.randint(-127, 128, size=(1, 1, c, e)).astype(np.int8))
    s1 = jnp.asarray(rng.rand(e).astype(np.float32) * 0.02)
    # large negative bias pushes many pixels to all-negative logits:
    # the K-pad columns (exactly 0 after the zero text padding) would
    # win there if the kernel didn't mask them
    b1 = jnp.asarray((rng.randn(e) - 2.0).astype(np.float32))
    txt = jnp.asarray(rng.randn(k, e).astype(np.float32))

    lo = head1_correlate_fused(xq, sx, w1q, s1, b1, txt, tile_m=64,
                               interpret=True)
    ref = np.argmax(np.asarray(lo, np.float32), axis=-1)
    got = np.asarray(head1_correlate_argmax_fused(
        xq, sx, w1q, s1, b1, txt, tile_m=64, interpret=True))
    assert got.shape == (n, h, w)
    agree = (got == ref).mean()
    assert agree >= 0.999, agree


def test_return_argmax_model_paths_agree():
    """LSegNet(return_argmax=True): the fused-kernel path and the
    explicit argmax-of-halfres-logits path produce the same label map,
    and the full-res map is its exact nearest-x2 upsample."""
    import dataclasses

    from lseg_tpu.models.lseg import LSegNet, _nearest2x
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, quant_int8="static"),
        decoder_quant="static", head_dtype="bfloat16", head_fused=True,
    )
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, base.out_c).astype(np.float32))
    v = LSegNet(base, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, txt)
    vq = dict(v)
    vq["params"] = quantize_tree(v["params"], decoder=True)

    half = m.apply(vq, x, txt, return_halfres=True)       # bf16 logits
    ref_half = np.argmax(np.asarray(half, np.float32), axis=-1)
    got_half = np.asarray(m.apply(vq, x, txt, return_argmax=True,
                                  return_halfres=True))
    assert got_half.shape == ref_half.shape
    assert (got_half == ref_half).mean() >= 0.999

    got_full = np.asarray(m.apply(vq, x, txt, return_argmax=True))
    assert got_full.shape == (1, 64, 64)
    np.testing.assert_array_equal(
        got_full, np.asarray(_nearest2x(jnp.asarray(got_half))))

    # XLA (non-fused) path implements the same serving semantics
    cfg_u = dataclasses.replace(cfg, head_fused=False)
    m_u = LSegNet(cfg_u, dtype=jnp.bfloat16)
    got_u = np.asarray(m_u.apply(vq, x, txt, return_argmax=True))
    assert (got_u == got_full).mean() > 0.97, (got_u == got_full).mean()


def test_conv_first_commute_exact():
    """FeatureFusionBlock(conv_first=True): out_conv and the x2
    align-corners upsample commute exactly (1x1 conv is channel-only,
    the interp is spatial-only with rows summing to 1, so the bias
    commutes too) — fp32 unquantized check, then the int8 serving
    model-level agreement."""
    import dataclasses

    from lseg_tpu.models.blocks import FeatureFusionBlock
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 10, 12, 16).astype(np.float32))
    skip = jnp.asarray(rng.randn(2, 10, 12, 16).astype(np.float32))
    ref_blk = FeatureFusionBlock(16, use_bn=True)
    v = ref_blk.init(jax.random.PRNGKey(0), x, skip)
    a = ref_blk.apply(v, x, skip)
    b = FeatureFusionBlock(16, use_bn=True, conv_first=True).apply(
        v, x, skip)
    assert a.shape == b.shape == (2, 20, 24, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)

    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, quant_int8="static"),
        decoder_quant="static", head_dtype="bfloat16", head_fused=True,
    )
    cfg_c = dataclasses.replace(cfg, decoder_conv_first=True)
    xm = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, base.out_c).astype(np.float32))
    vm = LSegNet(base, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), xm, txt)
    vq = dict(vm)
    vq["params"] = quantize_tree(vm["params"], decoder=True)
    la = np.asarray(LSegNet(cfg, dtype=jnp.bfloat16).apply(
        vq, xm, txt), np.float32)
    lb = np.asarray(LSegNet(cfg_c, dtype=jnp.bfloat16).apply(
        vq, xm, txt), np.float32)
    agree = (la.argmax(-1) == lb.argmax(-1)).mean()
    assert agree > 0.97, agree
    cos = (la * lb).sum() / (np.linalg.norm(la) * np.linalg.norm(lb)
                             + 1e-9)
    assert cos > 0.999, cos


def test_head1_argmax_t_kernel_matches_row_major():
    """head1_correlate_argmax_fused_t (transposed correlation, dense
    lane-major output, optional in-kernel quantize) == the row-major
    argmax kernel on identical operands, for both int8 and bf16 inputs
    (the bf16 path quantizes in-VMEM with the same divide/round/clip
    sequence as the unfused XLA pass). Includes the all-negative-logit
    K-pad masking case (sublane padding rows must never win)."""
    from lseg_tpu.ops.pallas_correlation import (
        head1_correlate_argmax_fused,
        head1_correlate_argmax_fused_t,
    )

    rng = np.random.RandomState(7)
    n, h, w, c, e, k = 2, 8, 16, 32, 24, 5
    xb = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 0.5
                     ).astype(jnp.bfloat16)
    sx = jnp.float32(0.037)
    xq = jnp.clip(jnp.round(xb.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    w1q = jnp.asarray(
        rng.randint(-127, 128, size=(1, 1, c, e)).astype(np.int8))
    s1 = jnp.asarray(rng.rand(e).astype(np.float32) * 0.02)
    b1 = jnp.asarray((rng.randn(e) - 2.0).astype(np.float32))
    txt = jnp.asarray(rng.randn(k, e).astype(np.float32))

    ref = np.asarray(head1_correlate_argmax_fused(
        xq, sx, w1q, s1, b1, txt, tile_m=64, interpret=True))
    got_q = np.asarray(head1_correlate_argmax_fused_t(
        xq, sx, w1q, s1, b1, txt, tile_m=64, interpret=True))
    got_b = np.asarray(head1_correlate_argmax_fused_t(
        xb, sx, w1q, s1, b1, txt, tile_m=64, interpret=True))
    assert got_q.shape == (n, h, w)
    np.testing.assert_array_equal(got_q, ref)
    np.testing.assert_array_equal(got_b, ref)


def test_presize_pos_embed_exact():
    """presize_pos_embed bakes the identical pos-embed resize into the
    serving tree: forwards through (base cfg, base params) and
    (presized cfg, presized params) agree to bf16 rounding, and the
    presized model's in-jit resize branch is dead (pretrain_grid ==
    runtime grid)."""
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.testing import tiny_vit_config
    from lseg_tpu.utils.checkpoint_convert import presize_pos_embed

    base = tiny_vit_config()
    m = LSegNet(base, dtype=jnp.bfloat16)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, base.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)

    params2, cfg2 = presize_pos_embed(v["params"], base, 64, 64)
    g = 64 // base.vit.patch_size
    assert cfg2.vit.pretrain_grid == g
    assert params2["vit"]["pos_embed"].shape[1] == 1 + g * g
    m2 = LSegNet(cfg2, dtype=jnp.bfloat16)

    a = np.asarray(m.apply(v, x, txt), np.float32)
    b = np.asarray(m2.apply({**dict(v), "params": params2}, x, txt),
                   np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=1e-2)

    # same-grid call is a no-op passthrough
    p3, c3 = presize_pos_embed(params2, cfg2, 64, 64)
    assert p3 is params2 and c3 is cfg2


def test_patch_embed_fused_matches_matmul_form():
    """ops/pallas_patch.patch_embed_fused == the flat patchify matmul
    up to fp32 reassociation of the 16 per-patch-row partials (<= 1
    output bf16 ulp), on a grid height NOT divisible by the preferred
    row block (exercises patch_rows_per_step fallback)."""
    from lseg_tpu.ops.pallas_patch import (
        patch_embed_fused,
        patch_rows_per_step,
    )

    rng = np.random.RandomState(5)
    n, h, w, c, p, d = 2, 7 * 8, 7 * 8, 3, 8, 64
    gh, gw = h // p, w // p
    assert patch_rows_per_step(gh) == 7
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    kern = jnp.asarray(rng.randn(p, p, c, d).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)

    xp = x.reshape(n, gh, p, gw, p * c).transpose(0, 1, 3, 2, 4)
    xp = xp.reshape(n, gh * gw, p * p * c)
    ref = (jnp.dot(xp.astype(jnp.bfloat16),
                   kern.reshape(p * p * c, d).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           + bias).astype(jnp.bfloat16)
    got = patch_embed_fused(x, kern, bias, p, d, interpret=True)
    assert got.shape == (n, gh * gw, d)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.06, rtol=0.02)


@pytest.mark.experimental
def test_flashlnq_scores_dtype_and_i8qk_variants_agree():
    """Measured-dead-end kernel knobs (kept as infrastructure, r4):
    bf16 in-kernel softmax scores and int8-requantized QK both LOSE end
    to end on v5e but remain selectable on
    flash_attention_ln_qkv_fused_q8 — pin that their outputs stay close
    to the fp32-scores default (both change only score precision; the
    label-level effect is bounded by the model drift gates when
    enabled)."""
    from lseg_tpu.ops.pallas_attention import (
        flash_attention_ln_qkv_fused_q8,
    )

    rng = np.random.RandomState(0)
    n, t, d, heads = 1, 32, 128, 2
    x = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(1 + 0.1 * rng.randn(d).astype(np.float32))
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wq = jnp.asarray(rng.randint(-127, 128, (d, 3 * d)).astype(np.int8))
    sw = jnp.asarray(rng.rand(3 * d).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.05)

    def run(**kw):
        oq, os = flash_attention_ln_qkv_fused_q8(
            x, g, b, wq, sw, bias, heads, (d // heads) ** -0.5,
            interpret=True, **kw)
        return (np.asarray(oq, np.float32)
                * np.asarray(os, np.float32))

    ref = run()
    # bounds measured on this fixture: bf16 scores + the int8 output
    # requantize compound to ~6%; int8 QK's score error scales with
    # |logit| (large on random data — exp amplifies it; trained-model
    # margins are the realistic gate) ~16%
    for kw, bound in (({"scores_dtype": jnp.bfloat16}, 0.08),
                      ({"qk_int8": True}, 0.25)):
        got = run(**kw)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < bound, (kw, err)


def test_flashlnq_lean_variant_matches_default():
    """attn_variant='lean' (softmax scale folded into the q dequant
    scales host-side + pad-key mask as a precomputed bias-row add —
    two fewer VPU passes per (T, T) score matrix) is exact up to one
    fp32 reassociation in the q dequant multiply before its bf16 cast;
    pin near-exact agreement with the default kernel on BOTH the
    padded (valid_len < T, mbias path) and unpadded interiors."""
    from lseg_tpu.ops.pallas_attention import (
        flash_attention_ln_qkv_fused_q8,
    )

    rng = np.random.RandomState(1)
    n, t, d, heads = 2, 32, 128, 2
    x = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(1 + 0.1 * rng.randn(d).astype(np.float32))
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wq = jnp.asarray(rng.randint(-127, 128, (d, 3 * d)).astype(np.int8))
    sw = jnp.asarray(rng.rand(3 * d).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.05)

    for valid_len in (None, 29):
        def run(**kw):
            oq, os = flash_attention_ln_qkv_fused_q8(
                x, g, b, wq, sw, bias, heads, (d // heads) ** -0.5,
                interpret=True, valid_len=valid_len, **kw)
            return (np.asarray(oq, np.float32)
                    * np.asarray(os, np.float32))

        ref = run()
        got = run(lean=True)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, (valid_len, err)

        # exp2 rides the lean fold with log2(e) additionally folded
        # into the q scales; unlike lean's exact power-of-two scale
        # fold, log2(e) changes the bf16 q rounding, so the bound is
        # looser (measured ~4% on this random fixture; trained-margin
        # behavior is gated like every other fast-int8 knob)
        got2 = run(exp2=True)
        err2 = np.abs(got2 - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err2 < 8e-2, (valid_len, err2)


def test_flashlnq_multipair_variants_match_default():
    """quad/octo/mono (2 / 4 / all head-pairs per grid step: wider
    weight blocks + multi-group scale blocks, the pair interior runs
    pps times per step) perform IDENTICAL arithmetic in identical
    order to the pair-per-step default — the emitted (int8, scales)
    must match exactly at every pairs_per_step factor."""
    from lseg_tpu.ops.pallas_attention import (
        flash_attention_ln_qkv_fused_q8,
    )

    rng = np.random.RandomState(2)
    n, t, d, heads = 2, 32, 512, 8  # pairs=4 -> pps in {2, 4}
    x = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(1 + 0.1 * rng.randn(d).astype(np.float32))
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wq = jnp.asarray(rng.randint(-127, 128, (d, 3 * d)).astype(np.int8))
    sw = jnp.asarray(rng.rand(3 * d).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.05)

    for valid_len in (None, 29):
        ref_q, ref_s = flash_attention_ln_qkv_fused_q8(
            x, g, b, wq, sw, bias, heads, (d // heads) ** -0.5,
            interpret=True, valid_len=valid_len)
        for kw in ({"quad": True}, {"pairs_per_step": 4}):
            got_q, got_s = flash_attention_ln_qkv_fused_q8(
                x, g, b, wq, sw, bias, heads, (d // heads) ** -0.5,
                interpret=True, valid_len=valid_len, **kw)
            np.testing.assert_array_equal(np.asarray(ref_q),
                                          np.asarray(got_q))
            np.testing.assert_array_equal(np.asarray(ref_s),
                                          np.asarray(got_s))


def test_lowres_head_matches_standard_argmax_head():
    """head_fused='lowres' (head1+correlate at H/4 on refinenet1's
    pre-upsample output, x2 logit upsample, argmax at H/2): the label
    map matches the standard fused argmax head up to bf16
    interp-rounding tie flips — the upsample and the head matmuls
    commute exactly, and the skipped per-pixel norm is argmax-invariant
    at the upsampled resolution."""
    import dataclasses

    from lseg_tpu.config import fast_serving
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import calibrate_act_scales, quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg = fast_serving(
        dataclasses.replace(
            base, vit=dataclasses.replace(base.vit, embed_dim=128,
                                          num_heads=2)),
        quant="static_cal")
    assert cfg.head_fused == "lowres" and cfg.decoder_conv_first
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(5, cfg.out_c).astype(np.float32))
    cfg0 = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="xla",
                                     quant_int8=False,
                                     patch_fused=False),
        decoder_quant=False)
    v0 = LSegNet(cfg0, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, t)
    vq = dict(v0)
    vq["params"] = quantize_tree(v0["params"], decoder=True,
                                 act_scale=True)
    m_lo = LSegNet(cfg, dtype=jnp.bfloat16)
    vq = calibrate_act_scales(m_lo, vq, x, t)

    cfg_std = dataclasses.replace(cfg, head_fused=True)
    m_std = LSegNet(cfg_std, dtype=jnp.bfloat16)
    pred_std = np.asarray(m_std.apply(vq, x, t, return_argmax=True))
    pred_lo = np.asarray(m_lo.apply(vq, x, t, return_argmax=True))
    assert pred_lo.shape == pred_std.shape == (2, 64, 64)
    agree = (pred_lo == pred_std).mean()
    # random-init margins are ~zero; bf16 rounding-order flips only
    assert agree > 0.97, agree

    # non-argmax calls through a 'lowres' config behave as the standard
    # fused head (full-res logits, normalized)
    lo_full = np.asarray(m_lo.apply(vq, x, t), np.float32)
    std_full = np.asarray(m_std.apply(vq, x, t), np.float32)
    np.testing.assert_array_equal(lo_full, std_full)
