"""Whole-model torch oracle: a literal tiny-scale reimplementation of the
reference forward in torch (reference: modules/models/lseg_net.py:160-205,
lseg_vit.py:104-201,446-523, lseg_blocks.py:60-110,222-358), whose
state_dict (reference key names) is run through `convert_lseg` and
compared against `LSegNet.apply` end to end.

This is the strongest parity statement available without the real
checkpoint: it cross-checks the full wiring (hooks -> project readout ->
act_postprocess -> scratch -> RCU fusion cascade -> head1 -> fp16
correlate -> x2 upsample), not just individual layers.

Also covers the CLIP-visual transplant converter
(`convert_clip_visual_to_vit`, reference: lseg_vit_zs.py:661-715) with a
torch nn.MultiheadAttention oracle.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.models.vit import Attention, Mlp
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.utils.checkpoint_convert import (
    convert_clip_visual_to_vit,
    convert_lseg,
)

torch.manual_seed(0)


def _t(*shape, scale=0.1):
    return torch.randn(*shape, dtype=torch.float64).float() * scale


def _make_state_dict(cfg):
    """Random-init reference-style state_dict for the tiny config.

    Key names follow the reference module tree exactly
    (timm ViT under pretrained.model, Sequential act_postprocess under
    pretrained, decoder under scratch — lseg_vit.py:446-523,
    lseg_blocks.py:60-110, lseg_net.py:126-156)."""
    vit = cfg.vit
    d = vit.embed_dim
    g0 = vit.pretrain_grid
    sd = {
        "pretrained.model.cls_token": _t(1, 1, d),
        "pretrained.model.pos_embed": _t(1, 1 + g0 * g0, d),
        "pretrained.model.patch_embed.proj.weight": _t(
            d, 3, vit.patch_size, vit.patch_size),
        "pretrained.model.patch_embed.proj.bias": _t(d),
    }
    for i in range(vit.hooks[-1] + 1):
        b = f"pretrained.model.blocks.{i}"
        sd[f"{b}.norm1.weight"] = 1 + _t(d)
        sd[f"{b}.norm1.bias"] = _t(d)
        sd[f"{b}.attn.qkv.weight"] = _t(3 * d, d)
        sd[f"{b}.attn.qkv.bias"] = _t(3 * d)
        sd[f"{b}.attn.proj.weight"] = _t(d, d)
        sd[f"{b}.attn.proj.bias"] = _t(d)
        sd[f"{b}.norm2.weight"] = 1 + _t(d)
        sd[f"{b}.norm2.bias"] = _t(d)
        sd[f"{b}.mlp.fc1.weight"] = _t(int(d * vit.mlp_ratio), d)
        sd[f"{b}.mlp.fc1.bias"] = _t(int(d * vit.mlp_ratio))
        sd[f"{b}.mlp.fc2.weight"] = _t(d, int(d * vit.mlp_ratio))
        sd[f"{b}.mlp.fc2.bias"] = _t(d)
    for i in range(4):
        p = f"pretrained.act_postprocess{i + 1}"
        ch = vit.post_channels[i]
        sd[f"{p}.0.project.0.weight"] = _t(d, 2 * d)
        sd[f"{p}.0.project.0.bias"] = _t(d)
        sd[f"{p}.3.weight"] = _t(ch, d, 1, 1)
        sd[f"{p}.3.bias"] = _t(ch)
        r = vit.resample[i]
        if r > 1:
            sd[f"{p}.4.weight"] = _t(ch, ch, int(r), int(r))
            sd[f"{p}.4.bias"] = _t(ch)
        elif r < 1:
            sd[f"{p}.4.weight"] = _t(ch, ch, 3, 3)
            sd[f"{p}.4.bias"] = _t(ch)
    f = cfg.features
    for i in range(4):
        sd[f"scratch.layer{i + 1}_rn.weight"] = _t(
            f, vit.post_channels[i], 3, 3)
    for i in range(1, 5):
        base = f"scratch.refinenet{i}"
        units = ("resConfUnit1", "resConfUnit2")
        for u in units:
            sd[f"{base}.{u}.conv1.weight"] = _t(f, f, 3, 3)
            sd[f"{base}.{u}.conv2.weight"] = _t(f, f, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{base}.{u}.{bn}.weight"] = 1 + 0.1 * _t(f)
                sd[f"{base}.{u}.{bn}.bias"] = _t(f)
                sd[f"{base}.{u}.{bn}.running_mean"] = _t(f)
                sd[f"{base}.{u}.{bn}.running_var"] = (
                    1 + 0.1 * _t(f)).abs()
        sd[f"{base}.out_conv.weight"] = _t(f, f, 1, 1)
        sd[f"{base}.out_conv.bias"] = _t(f)
    sd["scratch.head1.weight"] = _t(cfg.out_c, f, 1, 1)
    sd["scratch.head1.bias"] = _t(cfg.out_c)
    return sd


# ---------------------------------------------------------------------------
# torch oracle forward (eval mode, literal reference semantics)
# ---------------------------------------------------------------------------

def _oracle_block(sd, b, x):
    """timm 0.4.12 pre-norm ViT block (the compute behind
    reference lseg_vit.py:196-197)."""
    d = x.shape[-1]
    h = 2  # tiny config heads
    hd = d // h

    def ln(key, y):
        return F.layer_norm(y, (d,), sd[f"{key}.weight"],
                            sd[f"{key}.bias"], eps=1e-6)

    y = ln(f"{b}.norm1", x)
    B, T, _ = y.shape
    qkv = F.linear(y, sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"])
    qkv = qkv.reshape(B, T, 3, h, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, T, d)
    out = F.linear(out, sd[f"{b}.attn.proj.weight"],
                   sd[f"{b}.attn.proj.bias"])
    x = x + out
    y = ln(f"{b}.norm2", x)
    y = F.linear(y, sd[f"{b}.mlp.fc1.weight"], sd[f"{b}.mlp.fc1.bias"])
    y = F.gelu(y)
    y = F.linear(y, sd[f"{b}.mlp.fc2.weight"], sd[f"{b}.mlp.fc2.bias"])
    return x + y


def _oracle_rcu(sd, key, x):
    """ResidualConvUnit_custom, bn=True, eval (lseg_blocks.py:222-290)."""
    def bn(k, y):
        return F.batch_norm(
            y, sd[f"{k}.running_mean"], sd[f"{k}.running_var"],
            sd[f"{k}.weight"], sd[f"{k}.bias"], training=False, eps=1e-5)

    out = F.relu(x)
    out = F.conv2d(out, sd[f"{key}.conv1.weight"], None, padding=1)
    out = bn(f"{key}.bn1", out)
    out = F.relu(out)
    out = F.conv2d(out, sd[f"{key}.conv2.weight"], None, padding=1)
    out = bn(f"{key}.bn2", out)
    return out + x


def _oracle_fusion(sd, key, x, skip):
    """FeatureFusionBlock_custom forward (lseg_blocks.py:293-358)."""
    if skip is not None:
        x = x + _oracle_rcu(sd, f"{key}.resConfUnit1", skip)
    x = _oracle_rcu(sd, f"{key}.resConfUnit2", x)
    x = F.interpolate(x, scale_factor=2, mode="bilinear",
                      align_corners=True)
    return F.conv2d(x, sd[f"{key}.out_conv.weight"],
                    sd[f"{key}.out_conv.bias"])


def _oracle_forward(sd, cfg, x, text_features):
    """The reference LSeg.forward (lseg_net.py:160-205) at tiny scale."""
    vit = cfg.vit
    p = vit.patch_size
    B, _, H, W = x.shape
    gh, gw = H // p, W // p
    d = vit.embed_dim

    # forward_flex (lseg_vit.py:166-201)
    pos = sd["pretrained.model.pos_embed"]
    pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
    g0 = int(math.sqrt(pos_grid.shape[0]))
    if (gh, gw) != (g0, g0):
        pg = pos_grid.reshape(1, g0, g0, -1).permute(0, 3, 1, 2)
        pg = F.interpolate(pg, size=(gh, gw), mode="bilinear")
        pos_grid = pg.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
    else:
        pos_grid = pos_grid[None]
    pos = torch.cat([pos_tok, pos_grid], dim=1)
    t = F.conv2d(x, sd["pretrained.model.patch_embed.proj.weight"],
                 sd["pretrained.model.patch_embed.proj.bias"], stride=p)
    t = t.flatten(2).transpose(1, 2)
    cls = sd["pretrained.model.cls_token"].expand(B, -1, -1)
    t = torch.cat([cls, t], dim=1) + pos

    taps = {}
    for i in range(vit.hooks[-1] + 1):
        t = _oracle_block(sd, f"pretrained.model.blocks.{i}", t)
        if i in vit.hooks:
            taps[vit.hooks.index(i)] = t

    # act_postprocess 1-4 (lseg_vit.py:446-523) with project readout
    layers = []
    for i in range(4):
        key = f"pretrained.act_postprocess{i + 1}"
        a = taps[i]
        readout = a[:, 0].unsqueeze(1).expand_as(a[:, 1:])
        feats = torch.cat([a[:, 1:], readout], dim=-1)
        a = F.gelu(F.linear(feats, sd[f"{key}.0.project.0.weight"],
                            sd[f"{key}.0.project.0.bias"]))
        a = a.transpose(1, 2).reshape(B, d, gh, gw)
        a = F.conv2d(a, sd[f"{key}.3.weight"], sd[f"{key}.3.bias"])
        r = vit.resample[i]
        if r > 1:
            a = F.conv_transpose2d(a, sd[f"{key}.4.weight"],
                                   sd[f"{key}.4.bias"], stride=int(r))
        elif r < 1:
            a = F.conv2d(a, sd[f"{key}.4.weight"], sd[f"{key}.4.bias"],
                         stride=2, padding=1)
        layers.append(a)

    rn = [F.conv2d(layers[i], sd[f"scratch.layer{i + 1}_rn.weight"],
                   None, padding=1) for i in range(4)]

    path = _oracle_fusion(sd, "scratch.refinenet4", rn[3], None)
    path = _oracle_fusion(sd, "scratch.refinenet3", path, rn[2])
    path = _oracle_fusion(sd, "scratch.refinenet2", path, rn[1])
    path = _oracle_fusion(sd, "scratch.refinenet1", path, rn[0])

    img = F.conv2d(path, sd["scratch.head1.weight"],
                   sd["scratch.head1.bias"])
    return img, _oracle_head(cfg, img, text_features)


def _oracle_head(cfg, img, text_features):
    """Correlation + x2 output head (lseg_net.py:185-205,219-221)."""
    B, C, Hh, Ww = img.shape
    flat = img.permute(0, 2, 3, 1).reshape(-1, C)
    flat = flat / flat.norm(dim=-1, keepdim=True)
    txt = text_features / text_features.norm(dim=-1, keepdim=True)
    logits = cfg.logit_scale * flat.half() @ txt.half().t()
    out = logits.float().view(B, Hh, Ww, -1).permute(0, 3, 1, 2)
    return F.interpolate(out, scale_factor=2, mode="bilinear",
                         align_corners=True)


def test_whole_model_matches_torch_oracle():
    cfg = tiny_vit_config()
    sd = _make_state_dict(cfg)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    # non-square input, grid (6, 4) != pretrain grid 4 -> pos-embed
    # resize path exercised
    rng = np.random.RandomState(0)
    x = rng.randn(2, 96, 64, 3).astype(np.float32) * 0.5
    txt = rng.randn(5, cfg.out_c).astype(np.float32)

    with torch.no_grad():
        ref_img, ref_out = _oracle_forward(
            sd, cfg, torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(txt))

    variables = convert_lseg(sd_np, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = LSegNet(cfg, emulate_fp16=True)

    # (a) pixel embeddings before the fp16 correlation: tight fp32 check
    # of the entire backbone + decoder wiring
    emb = np.asarray(model.apply(variables, jnp.asarray(x), None))
    np.testing.assert_allclose(
        emb, ref_img.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=2e-4)

    # (b) full logits through the reference's fp16 correlation quirk:
    # both sides quantize to the fp16 grid; remaining slack is matmul
    # accumulation order at fp16 magnitudes (logits span ~±14)
    out = np.asarray(model.apply(
        variables, jnp.asarray(x), jnp.asarray(txt)))
    ref = ref_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=0, atol=0.05)
    assert (out.argmax(-1) == ref.argmax(-1)).mean() > 0.999


def test_clip_visual_transplant_matches_torch_mha():
    """convert_clip_visual_to_vit's in_proj->qkv / c_fc->fc1 mapping vs a
    torch nn.MultiheadAttention + MLP oracle
    (reference transplant: lseg_vit_zs.py:661-715)."""
    cfg = tiny_vit_config()
    vit = cfg.vit
    d, h = vit.embed_dim, vit.num_heads
    g0 = vit.pretrain_grid
    hid = int(d * vit.mlp_ratio)

    sd = {
        "clip_pretrained.visual.class_embedding": _t(d),
        "clip_pretrained.visual.conv1.weight": _t(
            d, 3, vit.patch_size, vit.patch_size),
        "clip_pretrained.visual.positional_embedding": _t(
            1 + g0 * g0, d),
    }
    for i in range(vit.hooks[-1] + 1):
        b = f"clip_pretrained.visual.transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = 1 + _t(d)
        sd[f"{b}.ln_1.bias"] = _t(d)
        sd[f"{b}.attn.in_proj_weight"] = _t(3 * d, d)
        sd[f"{b}.attn.in_proj_bias"] = _t(3 * d)
        sd[f"{b}.attn.out_proj.weight"] = _t(d, d)
        sd[f"{b}.attn.out_proj.bias"] = _t(d)
        sd[f"{b}.ln_2.weight"] = 1 + _t(d)
        sd[f"{b}.ln_2.bias"] = _t(d)
        sd[f"{b}.mlp.c_fc.weight"] = _t(hid, d)
        sd[f"{b}.mlp.c_fc.bias"] = _t(hid)
        sd[f"{b}.mlp.c_proj.weight"] = _t(d, hid)
        sd[f"{b}.mlp.c_proj.bias"] = _t(d)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    tree = convert_clip_visual_to_vit(sd_np, cfg)
    # pos embed transplants when the grid matches
    np.testing.assert_allclose(
        tree["pos_embed"][0],
        sd_np["clip_pretrained.visual.positional_embedding"])
    np.testing.assert_allclose(
        tree["cls_token"].reshape(-1),
        sd_np["clip_pretrained.visual.class_embedding"])

    # attention oracle on block 0: timm consumes the transplanted qkv
    # exactly as torch MHA consumes in_proj (packed q,k,v rows)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, d).astype(np.float32)
    b = "clip_pretrained.visual.transformer.resblocks.0"
    with torch.no_grad():
        ref, _ = F.multi_head_attention_forward(
            *(torch.from_numpy(x).transpose(0, 1),) * 3,
            d, h,
            sd[f"{b}.attn.in_proj_weight"], sd[f"{b}.attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[f"{b}.attn.out_proj.weight"], sd[f"{b}.attn.out_proj.bias"],
        )
        ref = ref.transpose(0, 1).numpy()
    blk = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a[0]), tree["seg0"]["blocks"])
    got = np.asarray(Attention(d, h).apply(
        {"params": blk["attn"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # MLP oracle: c_fc/c_proj -> fc1/fc2 (CLIP visual transplant runs
    # through timm's exact-erf GELU, reference lseg_vit_zs.py:700-707)
    with torch.no_grad():
        y = F.linear(torch.from_numpy(x), sd[f"{b}.mlp.c_fc.weight"],
                     sd[f"{b}.mlp.c_fc.bias"])
        y = F.linear(F.gelu(y), sd[f"{b}.mlp.c_proj.weight"],
                     sd[f"{b}.mlp.c_proj.bias"]).numpy()
    got = np.asarray(Mlp(d, hid).apply(
        {"params": blk["mlp"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, y, rtol=1e-4, atol=1e-5)
