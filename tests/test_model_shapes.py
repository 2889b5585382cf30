"""End-to-end shape tests for the LSeg model family on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lseg_tpu.config import (
    CLIPTextConfig,
    LSegConfig,
    ResNetConfig,
    ViTConfig,
)
from lseg_tpu.models.lseg import LSegNet

TINY_VIT = LSegConfig(
    backbone="tiny_vit",
    features=32,
    out_c=64,
    vit=ViTConfig(
        patch_size=16,
        embed_dim=64,
        depth=8,
        num_heads=2,
        hooks=(1, 3, 5, 7),
        post_channels=(16, 32, 64, 64),
        resample=(4.0, 2.0, 1.0, 0.5),
        pretrain_grid=4,
    ),
    text=CLIPTextConfig(vocab_size=64, width=32, layers=2, heads=2,
                        embed_dim=64),
)

TINY_RN = LSegConfig(
    backbone="tiny_rn",
    features=32,
    out_c=64,
    resnet=ResNetConfig(layers=(1, 1, 1, 1)),
    text=CLIPTextConfig(vocab_size=64, width=32, layers=2, heads=2,
                        embed_dim=64),
)


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_forward_shapes(cfg):
    model = LSegNet(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    txt = jnp.zeros((5, cfg.out_c))
    variables = model.init(jax.random.PRNGKey(0), x, txt)
    out = model.apply(variables, x, txt)
    assert out.shape == (2, 64, 64, 5)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("cfg", [TINY_VIT], ids=["vit"])
def test_variable_input_size(cfg):
    """Any multiple-of-patch input size works (pos-embed grid resize,
    reference forward_flex behavior lseg_vit.py:166-201)."""
    model = LSegNet(cfg)
    txt = jnp.zeros((3, cfg.out_c))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), txt
    )
    out = model.apply(variables, jnp.zeros((1, 96, 128, 3)), txt)
    assert out.shape == (1, 96, 128, 3)


def test_embedding_output():
    model = LSegNet(TINY_VIT)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 64)))
    emb = model.apply(variables, x, None)
    assert emb.shape == (1, 32, 32, 64)  # half-res, out_c channels


def test_arch_option_head_blocks():
    for arch in (1, 2):
        cfg = dataclasses.replace(TINY_VIT, arch_option=arch, block_depth=2)
        model = LSegNet(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        txt = jnp.zeros((4, cfg.out_c))
        variables = model.init(jax.random.PRNGKey(0), x, txt)
        out = model.apply(variables, x, txt)
        assert out.shape == (1, 64, 64, 4)


def test_train_mode_batch_stats():
    model = LSegNet(TINY_VIT)
    x = jnp.ones((2, 64, 64, 3))
    txt = jnp.ones((4, TINY_VIT.out_c))
    variables = model.init(jax.random.PRNGKey(0), x, txt, train=True)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, x, txt, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 64, 64, 4)
    # running stats actually updated
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(a, b)
        for a, b in zip(leaves_before, leaves_after)
    )


def test_attention_impls_agree():
    """xla einsum vs jax.nn.dot_product_attention: same math."""
    import dataclasses as dc

    cfg = TINY_VIT
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    )
    txt = jnp.asarray(
        np.random.RandomState(1).randn(3, cfg.out_c).astype(np.float32)
    )
    from lseg_tpu.models.lseg import LSegNet as _L

    m1 = _L(cfg)
    v = m1.init(jax.random.PRNGKey(0), x, txt)
    cfg2 = dc.replace(cfg, vit=dc.replace(cfg.vit, attn_impl="dpa"))
    m2 = _L(cfg2)
    o1 = np.asarray(m1.apply(v, x, txt))
    o2 = np.asarray(m2.apply(v, x, txt))
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-4)


def test_all_registry_backbones_wire_up():
    """Every registry config initializes and produces the right output
    shape (eval_shape only — no compute), incl. ViT-B/32's different
    hooks/resample ladder and RN101."""
    from lseg_tpu.config import BACKBONES
    from lseg_tpu.models.lseg import LSegNet as _L

    for name, cfg in BACKBONES.items():
        model = _L(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        txt = jnp.zeros((5, cfg.out_c))

        def init_and_apply():
            v = model.init(jax.random.PRNGKey(0), x, txt)
            return model.apply(v, x, txt)

        out = jax.eval_shape(init_and_apply)
        assert out.shape == (1, 64, 64, 5), (name, out.shape)
        assert out.dtype == jnp.float32, name


@pytest.mark.experimental
def test_single_scan_matches_segmented():
    """ViTConfig.single_scan=True (one whole-depth scan, taps gathered
    from the streamed ys) must reproduce the segmented model exactly on
    converted params (utils.checkpoint_convert.segments_to_single_scan
    concatenates seg0..3 stacked block params in block order)."""
    import dataclasses

    import numpy as np

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.testing import tiny_vit_config
    from lseg_tpu.utils.checkpoint_convert import segments_to_single_scan

    cfg = tiny_vit_config()
    cfg_ss = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, single_scan=True))
    m = LSegNet(cfg)
    ms = LSegNet(cfg_ss)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    vs = {"params": segments_to_single_scan(v["params"]),
          "batch_stats": v["batch_stats"]}
    # the converted tree must match the single-scan model's own init
    # structure (so checkpoints convert cleanly)
    vs0 = ms.init(jax.random.PRNGKey(0), x, txt)
    assert jax.tree_util.tree_structure(
        vs0["params"]) == jax.tree_util.tree_structure(vs["params"])
    a = np.asarray(m.apply(v, x, txt))
    b = np.asarray(ms.apply(vs, x, txt))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
