"""Checkpoint-converter tests: the torch-free .pt reader, per-layer
layout conversions verified against torch ops, and a full synthetic
reference-style state_dict loading into the flax model structure."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.utils.checkpoint_convert import (
    _conv,
    _deconv,
    _lin,
    convert_lseg,
    extract_state_dict,
    load_torch_file,
)


def test_torch_free_loader_roundtrip(tmp_path):
    sd = {
        "net.a.weight": torch.randn(4, 3),
        "net.a.bias": torch.randn(4),
        "net.b.weight": torch.randn(2, 3, 3, 3).half(),
        "epoch": 7,  # non-tensor entries are dropped
    }
    path = tmp_path / "ck.ckpt"
    torch.save({"state_dict": sd, "hparams": {"x": 1}}, str(path))
    loaded = extract_state_dict(load_torch_file(str(path)))
    assert set(loaded) == {"a.weight", "a.bias", "b.weight"}
    np.testing.assert_allclose(loaded["a.weight"], sd["net.a.weight"])
    np.testing.assert_allclose(
        loaded["b.weight"], sd["net.b.weight"].float(), rtol=1e-3
    )


def test_linear_layout_matches_torch():
    import flax.linen as nn

    w = np.random.RandomState(0).randn(6, 4).astype(np.float32)
    b = np.random.RandomState(1).randn(6).astype(np.float32)
    x = np.random.RandomState(2).randn(2, 4).astype(np.float32)
    ref = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()
    params = _lin({"k.weight": w, "k.bias": b}, "k")
    got = nn.Dense(6).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_conv_layout_matches_torch():
    import flax.linen as nn

    w = np.random.RandomState(0).randn(5, 3, 3, 3).astype(np.float32)
    b = np.random.RandomState(1).randn(5).astype(np.float32)
    x = np.random.RandomState(2).randn(1, 3, 8, 8).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    params = _conv({"k.weight": w, "k.bias": b}, "k")
    got = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)]).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_deconv_layout_matches_torch():
    from lseg_tpu.models.blocks import TokenUpsample

    w = np.random.RandomState(0).randn(4, 4, 2, 2).astype(np.float32)
    b = np.random.RandomState(1).randn(4).astype(np.float32)
    x = np.random.RandomState(2).randn(1, 4, 5, 6).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2,
    ).numpy().transpose(0, 2, 3, 1)
    params = _deconv({"k.weight": w, "k.bias": b}, "k")
    got = TokenUpsample(4, 2).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def _tiny_reference_state_dict(cfg):
    """Synthetic reference-style state_dict with the torch naming scheme
    (pretrained.model.* / pretrained.act_postprocess* / scratch.*) at
    the tiny config's shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    vit = cfg.vit
    d = vit.embed_dim
    base = "pretrained.model"
    sd[f"{base}.cls_token"] = t(1, 1, d)
    sd[f"{base}.pos_embed"] = t(1, 1 + vit.pretrain_grid ** 2, d)
    sd[f"{base}.patch_embed.proj.weight"] = t(
        d, 3, vit.patch_size, vit.patch_size
    )
    sd[f"{base}.patch_embed.proj.bias"] = t(d)
    for i in range(vit.depth):
        k = f"{base}.blocks.{i}"
        sd[f"{k}.norm1.weight"] = t(d)
        sd[f"{k}.norm1.bias"] = t(d)
        sd[f"{k}.attn.qkv.weight"] = t(3 * d, d)
        sd[f"{k}.attn.qkv.bias"] = t(3 * d)
        sd[f"{k}.attn.proj.weight"] = t(d, d)
        sd[f"{k}.attn.proj.bias"] = t(d)
        sd[f"{k}.norm2.weight"] = t(d)
        sd[f"{k}.norm2.bias"] = t(d)
        hid = int(d * vit.mlp_ratio)
        sd[f"{k}.mlp.fc1.weight"] = t(hid, d)
        sd[f"{k}.mlp.fc1.bias"] = t(hid)
        sd[f"{k}.mlp.fc2.weight"] = t(d, hid)
        sd[f"{k}.mlp.fc2.bias"] = t(d)
    for i in range(1, 5):
        pc = vit.post_channels[i - 1]
        k = f"pretrained.act_postprocess{i}"
        sd[f"{k}.0.project.0.weight"] = t(d, 2 * d)
        sd[f"{k}.0.project.0.bias"] = t(d)
        sd[f"{k}.3.weight"] = t(pc, d, 1, 1)
        sd[f"{k}.3.bias"] = t(pc)
        r = vit.resample[i - 1]
        if r > 1:
            s = int(r)
            sd[f"{k}.4.weight"] = t(pc, pc, s, s)
            sd[f"{k}.4.bias"] = t(pc)
        elif r < 1:
            sd[f"{k}.4.weight"] = t(pc, pc, 3, 3)
            sd[f"{k}.4.bias"] = t(pc)
    f = cfg.features
    for i in range(1, 5):
        sd[f"scratch.layer{i}_rn.weight"] = t(
            f, vit.post_channels[i - 1], 3, 3
        )
    for i in range(1, 5):
        k = f"scratch.refinenet{i}"
        units = ("resConfUnit2",) if i == 4 else (
            "resConfUnit1", "resConfUnit2"
        )
        for u in units:
            sd[f"{k}.{u}.conv1.weight"] = t(f, f, 3, 3)
            sd[f"{k}.{u}.conv2.weight"] = t(f, f, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{k}.{u}.{bn}.weight"] = t(f)
                sd[f"{k}.{u}.{bn}.bias"] = t(f)
                sd[f"{k}.{u}.{bn}.running_mean"] = t(f)
                sd[f"{k}.{u}.{bn}.running_var"] = np.abs(t(f)) + 1.0
        sd[f"{k}.out_conv.weight"] = t(f, f, 1, 1)
        sd[f"{k}.out_conv.bias"] = t(f)
    sd["scratch.head1.weight"] = t(cfg.out_c, f, 1, 1)
    sd["scratch.head1.bias"] = t(cfg.out_c)
    return sd


def test_full_convert_structure_matches_model():
    cfg = tiny_vit_config()
    sd = _tiny_reference_state_dict(cfg)
    converted = convert_lseg(sd, cfg)

    model = LSegNet(cfg)
    txt = jnp.zeros((3, cfg.out_c))
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), txt, train=True
    )
    # identical tree structure AND leaf shapes
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert jax.tree_util.tree_structure(
        ref_shapes
    ) == jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes

    # converted weights actually run
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)), txt)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_palette():
    from lseg_tpu.utils.palette import class_palette, colorize, overlay

    pal = class_palette(21)
    assert pal.shape == (21, 3)
    # VOC convention: class 1 = maroon (128, 0, 0)
    np.testing.assert_array_equal(pal[1], [128, 0, 0])
    mask = np.array([[0, 1], [1, 0]])
    col = colorize(mask, pal)
    assert col.shape == (2, 2, 3)
    img = np.zeros((2, 2, 3), np.uint8)
    out = overlay(img, mask, pal, alpha=0.5)
    np.testing.assert_array_equal(out[0, 1], [64, 0, 0])


def test_convert_clip_text_structure_and_run():
    from lseg_tpu.models.clip_text import CLIPTextEncoder
    from lseg_tpu.testing import TINY_TEXT
    from lseg_tpu.utils.checkpoint_convert import convert_clip_text

    cfg = TINY_TEXT
    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    sd = {
        "clip_pretrained.token_embedding.weight": t(cfg.vocab_size,
                                                    cfg.width),
        "clip_pretrained.positional_embedding": t(cfg.context_length,
                                                  cfg.width),
        "clip_pretrained.ln_final.weight": t(cfg.width),
        "clip_pretrained.ln_final.bias": t(cfg.width),
        "clip_pretrained.text_projection": t(cfg.width, cfg.embed_dim),
    }
    for i in range(cfg.layers):
        k = f"clip_pretrained.transformer.resblocks.{i}"
        sd[f"{k}.ln_1.weight"] = t(cfg.width)
        sd[f"{k}.ln_1.bias"] = t(cfg.width)
        sd[f"{k}.attn.in_proj_weight"] = t(3 * cfg.width, cfg.width)
        sd[f"{k}.attn.in_proj_bias"] = t(3 * cfg.width)
        sd[f"{k}.attn.out_proj.weight"] = t(cfg.width, cfg.width)
        sd[f"{k}.attn.out_proj.bias"] = t(cfg.width)
        sd[f"{k}.ln_2.weight"] = t(cfg.width)
        sd[f"{k}.ln_2.bias"] = t(cfg.width)
        sd[f"{k}.mlp.c_fc.weight"] = t(4 * cfg.width, cfg.width)
        sd[f"{k}.mlp.c_fc.bias"] = t(4 * cfg.width)
        sd[f"{k}.mlp.c_proj.weight"] = t(cfg.width, 4 * cfg.width)
        sd[f"{k}.mlp.c_proj.bias"] = t(cfg.width)
    converted = convert_clip_text(sd)

    enc = CLIPTextEncoder(cfg)
    tokens = jnp.zeros((2, cfg.context_length), jnp.int32).at[:, 1].set(5)
    init_vars = enc.init(jax.random.PRNGKey(0), tokens)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes
    out = enc.apply(converted, tokens)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
