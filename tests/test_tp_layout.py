"""Head-aligned tensor-parallel attention layout: numerical equivalence
with the flat layout, sharded==single-device, and the collective-count
win over the naive flat-dim sharding (VERDICT round-1 weak #6)."""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
)
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.utils.checkpoint_convert import from_tp_layout, to_tp_layout


def _models_and_inputs():
    cfg = tiny_vit_config()
    cfg_tp = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, tp_layout=True))
    m = LSegNet(cfg)
    mtp = LSegNet(cfg_tp)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    return cfg, m, mtp, x, txt


def test_tp_layout_matches_flat_exactly():
    cfg, m, mtp, x, txt = _models_and_inputs()
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vtp = dict(v)
    vtp["params"] = jax.tree_util.tree_map(
        jnp.asarray, to_tp_layout(v["params"], cfg.vit.num_heads))
    # structure matches the tp model's own init
    want = jax.tree_util.tree_map(
        lambda a: a.shape, mtp.init(jax.random.PRNGKey(0), x, txt)["params"])
    got = jax.tree_util.tree_map(lambda a: a.shape, vtp["params"])
    assert want == got
    a = np.asarray(m.apply(v, x, txt))
    b = np.asarray(mtp.apply(vtp, x, txt))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # round trip back to flat
    back = from_tp_layout(
        jax.tree_util.tree_map(np.asarray, vtp["params"]),
        cfg.vit.num_heads)
    flat = jax.tree_util.tree_map(np.asarray, v["params"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, back, flat)


def test_tp_layout_sharded_matches_single_device():
    cfg, m, mtp, x, txt = _models_and_inputs()
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vtp = dict(v)
    vtp["params"] = jax.tree_util.tree_map(
        jnp.asarray, to_tp_layout(v["params"], cfg.vit.num_heads))
    ref = np.asarray(mtp.apply(vtp, x, txt))

    mesh = create_mesh(n_data=4, n_model=2)
    sh = param_shardings(vtp, mesh)
    qkv = sh["params"]["vit"]["seg0"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(
        None, None, None, "model", None)
    vs = jax.device_put(vtp, sh)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = np.asarray(jax.jit(mtp.apply)(vs, xs, txt))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _collective_count(model, variables, x, txt, mesh):
    sh = param_shardings(variables, mesh)
    vs = jax.device_put(variables, sh)
    xs = jax.device_put(x, batch_sharding(mesh))
    hlo = jax.jit(model.apply).lower(vs, xs, txt).compile().as_text()
    return len(re.findall(
        r"all-gather|all-to-all|collective-permute|all-reduce", hlo))


def test_head_aligned_tp_fewer_collectives_than_flat():
    """The measurement VERDICT asked for: on the 4x2 mesh the
    head-aligned layout compiles to fewer re-layout collectives in the
    ViT blocks than the naive flat-output-dim sharding."""
    cfg, m, mtp, x, txt = _models_and_inputs()
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vtp = dict(v)
    vtp["params"] = jax.tree_util.tree_map(
        jnp.asarray, to_tp_layout(v["params"], cfg.vit.num_heads))
    mesh = create_mesh(n_data=4, n_model=2)
    n_flat = _collective_count(m, v, x, txt, mesh)
    n_tp = _collective_count(mtp, vtp, x, txt, mesh)
    assert n_tp < n_flat, (n_tp, n_flat)


def _hd64_vit_cfg(**kw):
    """Smallest config that is flat-flash-eligible when tp_layout is
    off (head_dim 64, even heads, T=17 not a sublane multiple)."""
    import dataclasses as dc

    from lseg_tpu.config import ViTConfig

    base = ViTConfig(
        patch_size=16, embed_dim=128, depth=2, num_heads=2,
        hooks=(0, 1), post_channels=(16, 32), resample=(4.0, 2.0),
        pretrain_grid=4,
    )
    return dc.replace(base, **kw) if kw else base


def test_flash_impl_with_tp_layout_takes_unpadded_tp_path():
    """Regression (round-2 advisor, medium): flashflat/flashq with
    tp_layout=True must fall back to the XLA TP attention path WITHOUT
    sublane token padding — the padded fallback ran unmasked attention
    whose pad keys (LN + qkv bias) mixed into real tokens."""
    from lseg_tpu.models.vit import DenseViT

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    ref_m = DenseViT(_hd64_vit_cfg(attn_impl="xla", tp_layout=True))
    v = ref_m.init(jax.random.PRNGKey(0), x)
    ref_taps, _ = ref_m.apply(v, x)
    for impl in ("flashflat", "flashq", "flashlnq"):
        m = DenseViT(_hd64_vit_cfg(attn_impl=impl, tp_layout=True))
        taps, _ = m.apply(v, x)  # same param tree: both use the TP path
        for a, b in zip(ref_taps, taps):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flashqp_with_tp_layout_keeps_attention_residual():
    """Regression (round-2 advisor, medium): Block with
    attn_impl='flashqp', quant='static', tp_layout=True used to take
    the fused branch while Attention routed to the TP path that
    ignores `resid` — silently dropping the attention residual."""
    from lseg_tpu.models.vit import Block

    d, h = 128, 2
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 17, d).astype(np.float32))
    ref_m = Block(dim=d, num_heads=h, mlp_ratio=2.0,
                  attn_impl="xla", quant="static", tp_layout=True)
    v = ref_m.init(jax.random.PRNGKey(0), x)
    ref, _ = ref_m.apply(v, x)
    m = Block(dim=d, num_heads=h, mlp_ratio=2.0,
              attn_impl="flashqp", quant="static", tp_layout=True)
    out, _ = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
