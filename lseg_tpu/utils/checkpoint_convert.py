"""Convert reference (PyTorch-Lightning / raw state_dict) LSeg checkpoints
into lseg_tpu parameter pytrees.

The reference ships Lightning `.ckpt` dicts whose `state_dict` holds keys
under a `net.` prefix (reference: utils.py:94-112, test_lseg.py:221-246)
plus raw `torch.save(state_dict)` exports (test_lseg.py:304-306,
lseg_net.py:81-92). This module maps those tensor names onto the
`LSegNet` / `CLIPTextEncoder` flax trees:

- torch Linear (out,in)            -> Dense kernel (in,out)
- torch Conv2d (O,I,kh,kw)         -> Conv kernel (kh,kw,I,O)
- torch ConvTranspose2d (I,O,k,k)  -> TokenUpsample kernel (I,k,k,O)
- torch BatchNorm                  -> params {scale,bias} + batch_stats
                                      {mean,var}
- per-block ViT weights            -> stacked per scan segment (axis 0)

Tensors the reference trains-but-never-uses (refinenet4.resConfUnit1 —
fusion block 4 has no skip input, lseg_net.py:176; the trailing ViT blocks
and final norm after the last hook; `logit_scale`, a non-leaf constant,
lseg_net.py:141) are intentionally dropped.

Loading the tensors does NOT require torch: `.ckpt`/`.pt` zip archives are
unpacked directly (torch serialization is a zip of raw tensor storages),
with a torch fallback when available.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

from lseg_tpu.config import LSegConfig

# ---------------------------------------------------------------------------
# torch-free .pt/.ckpt reader
# ---------------------------------------------------------------------------

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


class _TorchUnpickler(pickle.Unpickler):
    """Minimal unpickler for torch checkpoint archives: resolves storages
    from the zip and rebuilds tensors as numpy arrays."""

    def __init__(self, data: bytes, archive: zipfile.ZipFile, prefix: str):
        super().__init__(io.BytesIO(data))
        self.archive = archive
        self.prefix = prefix

    def find_class(self, module, name):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2", "_rebuild_tensor",
        ):
            return _rebuild_tensor
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch.serialization":
            return lambda *a, **k: None
        if module == "torch" and name in ("float32", "float16", "bfloat16",
                                          "int64", "float64"):
            return name
        # Anything else (Lightning callbacks etc.) -> inert stub
        return _Stub

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = (
            pid[0], pid[1], pid[2], pid[3], pid[4]
        )
        assert typename == "storage", typename
        name = f"{self.prefix}data/{key}"
        raw = self.archive.read(name)
        if storage_type.name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16, count=numel)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(
                raw, dtype=_DTYPES[storage_type.name], count=numel
            )
        return arr


class _StorageType:
    def __init__(self, name):
        self.name = name


class _Stub:
    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.state = state


def _rebuild_tensor(storage, storage_offset, size, stride, *args):
    arr = storage[storage_offset: storage_offset + int(np.prod(size))
                  if size else storage_offset + 1]
    if not size:
        return arr.reshape(())
    return np.lib.stride_tricks.as_strided(
        arr, shape=size,
        strides=[s * arr.itemsize for s in stride],
    ).copy()


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-serialized checkpoint (zip format) as numpy arrays,
    without importing torch."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            n for n in zf.namelist() if n.endswith("data.pkl")
        )
        prefix = pkl_name[: -len("data.pkl")]
        obj = _TorchUnpickler(zf.read(pkl_name), zf, prefix).load()
    return obj


def extract_state_dict(ckpt: Any) -> Dict[str, np.ndarray]:
    """Pull the flat name->tensor dict out of a Lightning ckpt or raw
    state_dict, normalizing away `net.` / `module.` prefixes."""
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if not isinstance(v, np.ndarray):
            continue
        for pre in ("net.", "module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def _lin(sd, key):
    return {"kernel": sd[f"{key}.weight"].T.astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32)}


def _conv(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)
           .astype(np.float32)}
    if bias:
        out["bias"] = sd[f"{key}.bias"].astype(np.float32)
    return out


def _deconv(sd, key):
    # ConvTranspose2d weight (I, O, k, k) -> TokenUpsample (I, k, k, O)
    return {"kernel": sd[f"{key}.weight"].transpose(0, 2, 3, 1)
            .astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32)}


def _bn(sd, key):
    params = {"scale": sd[f"{key}.weight"].astype(np.float32),
              "bias": sd[f"{key}.bias"].astype(np.float32)}
    stats = {"mean": sd[f"{key}.running_mean"].astype(np.float32),
             "var": sd[f"{key}.running_var"].astype(np.float32)}
    return params, stats


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"].astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32)}


def _stack(dicts):
    """Stack a list of identically-structured nested dicts along axis 0
    (scan-stacked block params)."""
    out = {}
    for k in dicts[0]:
        vals = [d[k] for d in dicts]
        if isinstance(vals[0], dict):
            out[k] = _stack(vals)
        else:
            out[k] = np.stack(vals, axis=0)
    return out


# ---------------------------------------------------------------------------
# model converters
# ---------------------------------------------------------------------------

def _convert_vit_block(sd, key) -> Dict[str, Any]:
    return {
        "norm1": _ln(sd, f"{key}.norm1"),
        "attn": {"qkv": _lin(sd, f"{key}.attn.qkv"),
                 "proj": _lin(sd, f"{key}.attn.proj")},
        "norm2": _ln(sd, f"{key}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{key}.mlp.fc1"),
                "fc2": _lin(sd, f"{key}.mlp.fc2")},
    }


def convert_vit(sd: Dict[str, np.ndarray], cfg: LSegConfig) -> Dict[str, Any]:
    """pretrained.model.* -> vit/ tree (segment-stacked blocks)."""
    vit = cfg.vit
    base = "pretrained.model"
    tree: Dict[str, Any] = {
        "patch_embed": _conv(sd, f"{base}.patch_embed.proj"),
        "cls_token": sd[f"{base}.cls_token"].astype(np.float32),
        "pos_embed": sd[f"{base}.pos_embed"].astype(np.float32),
    }
    prev = -1
    for s, hook in enumerate(vit.hooks):
        blocks = [
            _convert_vit_block(sd, f"{base}.blocks.{i}")
            for i in range(prev + 1, hook + 1)
        ]
        tree[f"seg{s}"] = {"blocks": _stack(blocks)}
        prev = hook
    return tree


def _convert_reassemble(sd, idx: int, cfg: LSegConfig) -> Dict[str, Any]:
    """pretrained.act_postprocess{idx}.* -> reassemble{idx}/ tree.

    Sequential layout (reference lseg_vit.py:446-523): 0=readout,
    1=Transpose, 2=Unflatten (implicit), 3=1×1 conv, 4=resample (when
    present: ConvTranspose for upsample levels, 3×3 s2 Conv for the
    downsample level)."""
    base = f"pretrained.act_postprocess{idx}"
    out: Dict[str, Any] = {}
    if cfg.readout == "project":
        out["readout"] = {"project": _lin(sd, f"{base}.0.project.0")}
    out["proj"] = _conv(sd, f"{base}.3")
    resample = cfg.vit.resample[idx - 1]
    if resample > 1:
        out["resample"] = _deconv(sd, f"{base}.4")
    elif resample < 1:
        out["resample"] = _conv(sd, f"{base}.4")
    return out


def _convert_rcu(sd, key, use_bn) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {
        "conv1": _conv(sd, f"{key}.conv1", bias=not use_bn),
        "conv2": _conv(sd, f"{key}.conv2", bias=not use_bn),
    }
    stats: Dict[str, Any] = {}
    if use_bn:
        p1, s1 = _bn(sd, f"{key}.bn1")
        p2, s2 = _bn(sd, f"{key}.bn2")
        params["bn1"], params["bn2"] = p1, p2
        stats["bn1"], stats["bn2"] = s1, s2
    return params, stats


def _convert_fusion(sd, key, use_bn, has_skip) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if has_skip:
        p, s = _convert_rcu(sd, f"{key}.resConfUnit1", use_bn)
        params["rcu1"] = p
        if s:
            stats["rcu1"] = s
    p, s = _convert_rcu(sd, f"{key}.resConfUnit2", use_bn)
    params["rcu2"] = p
    if s:
        stats["rcu2"] = s
    params["out_conv"] = _conv(sd, f"{key}.out_conv")
    return params, stats


def _convert_resnet(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """pretrained.layer{1..4}.* (repackaged torchvision resnet101,
    reference lseg_vit_zs.py:751-761) -> resnet/ tree.

    Reference stage packaging: layer1 = Sequential(conv1, bn1, relu,
    maxpool, layer1) so its torch indices are 0=conv1, 1=bn1, 4=layer1;
    layers 2-4 are bare torchvision layer modules."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = _conv(sd, "pretrained.layer1.0", bias=False)
    p, s = _bn(sd, "pretrained.layer1.1")
    params["bn1"], stats["bn1"] = p, s

    stage_blocks = (3, 4, 23, 3)
    for stage in range(4):
        prefix = (
            f"pretrained.layer1.4" if stage == 0
            else f"pretrained.layer{stage + 1}"
        )
        for b in range(stage_blocks[stage]):
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = _conv(
                    sd, f"{prefix}.{b}.conv{ci}", bias=False
                )
                pbn, sbn = _bn(sd, f"{prefix}.{b}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = pbn, sbn
            if f"{prefix}.{b}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(
                    sd, f"{prefix}.{b}.downsample.0", bias=False
                )
                pbn, sbn = _bn(sd, f"{prefix}.{b}.downsample.1")
                bp["down_bn"], bs["down_bn"] = pbn, sbn
            params[f"layer{stage + 1}_block{b}"] = bp
            stats[f"layer{stage + 1}_block{b}"] = bs
    return params, stats


def convert_lseg(
    sd: Dict[str, np.ndarray], cfg: LSegConfig
) -> Dict[str, Any]:
    """Full reference state_dict -> {'params': ..., 'batch_stats': ...}
    variables for `LSegNet`."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if cfg.is_vit:
        params["vit"] = convert_vit(sd, cfg)
        for i in range(1, 5):
            params[f"reassemble{i}"] = _convert_reassemble(sd, i, cfg)
    else:
        p, s = _convert_resnet(sd)
        params["resnet"], stats["resnet"] = p, s

    params["scratch"] = {
        f"layer{i}_rn": _conv(sd, f"scratch.layer{i}_rn", bias=False)
        for i in range(1, 5)
    }
    for i in range(1, 5):
        p, s = _convert_fusion(
            sd, f"scratch.refinenet{i}", cfg.use_bn, has_skip=(i != 4)
        )
        params[f"refinenet{i}"] = p
        if s:
            stats[f"refinenet{i}"] = s
    params["head1"] = _conv(sd, "scratch.head1")

    if cfg.arch_option in (1, 2):
        key = "scratch.head_block.depthwise.depthwise"
        params["head_block"] = {
            "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)
            .astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32),
        }

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_clip_text(
    sd: Dict[str, np.ndarray], layers: Optional[int] = None
) -> Dict[str, Any]:
    """clip_pretrained.* (text tower) -> CLIPTextEncoder params tree."""
    base = "clip_pretrained"
    if layers is None:
        layers = 1 + max(
            int(k.split(".")[3])
            for k in sd
            if k.startswith(f"{base}.transformer.resblocks.")
        )
    blocks = []
    for i in range(layers):
        key = f"{base}.transformer.resblocks.{i}"
        blocks.append({
            "ln_1": _ln(sd, f"{key}.ln_1"),
            "attn": {
                "in_proj": {
                    "kernel": sd[f"{key}.attn.in_proj_weight"].T
                    .astype(np.float32),
                    "bias": sd[f"{key}.attn.in_proj_bias"]
                    .astype(np.float32),
                },
                "out_proj": _lin(sd, f"{key}.attn.out_proj"),
            },
            "ln_2": _ln(sd, f"{key}.ln_2"),
            "c_fc": _lin(sd, f"{key}.mlp.c_fc"),
            "c_proj": _lin(sd, f"{key}.mlp.c_proj"),
        })
    return {
        "params": {
            "token_embedding": sd[f"{base}.token_embedding.weight"]
            .astype(np.float32),
            "positional_embedding": sd[f"{base}.positional_embedding"]
            .astype(np.float32),
            # the scan module is named 'resblocks', so the stacked block
            # params sit directly under it
            "resblocks": _stack(blocks),
            "ln_final": _ln(sd, f"{base}.ln_final"),
            "text_projection": sd[f"{base}.text_projection"]
            .astype(np.float32),
        }
    }


def load_reference_checkpoint(
    path: str, cfg: LSegConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """One-call loader: reference .ckpt path -> (lseg_variables,
    text_variables)."""
    sd = extract_state_dict(load_torch_file(path))
    return convert_lseg(sd, cfg), convert_clip_text(sd)


def convert_clip_visual_to_vit(
    sd: Dict[str, np.ndarray], cfg: LSegConfig,
    prefix: str = "clip_pretrained.visual",
) -> Dict[str, Any]:
    """CLIP visual-tower weights -> DenseViT tree (the reference's
    'clip'/'clip_fixed' transplant init, lseg_vit_zs.py:661-715):
    class_embedding -> cls_token, conv1 -> patch_embed (bias zero — CLIP
    conv1 has no bias), in_proj -> qkv, ln_1/ln_2 -> norm1/norm2,
    mlp c_fc/c_proj -> fc1/fc2. The position embedding transplants too
    when the grids agree; otherwise the timm init stays (the reference
    leaves pos_embed at timm init as well)."""
    vit = cfg.vit
    d = vit.embed_dim

    def ln(key):
        return {"scale": sd[f"{key}.weight"].astype(np.float32),
                "bias": sd[f"{key}.bias"].astype(np.float32)}

    def block(i):
        key = f"{prefix}.transformer.resblocks.{i}"
        return {
            "norm1": ln(f"{key}.ln_1"),
            "attn": {
                "qkv": {
                    "kernel": sd[f"{key}.attn.in_proj_weight"].T
                    .astype(np.float32),
                    "bias": sd[f"{key}.attn.in_proj_bias"]
                    .astype(np.float32),
                },
                "proj": _lin(sd, f"{key}.attn.out_proj"),
            },
            "norm2": ln(f"{key}.ln_2"),
            "mlp": {"fc1": _lin(sd, f"{key}.mlp.c_fc"),
                    "fc2": _lin(sd, f"{key}.mlp.c_proj")},
        }

    tree: Dict[str, Any] = {
        "cls_token": sd[f"{prefix}.class_embedding"]
        .reshape(1, 1, d).astype(np.float32),
        "patch_embed": {
            "kernel": sd[f"{prefix}.conv1.weight"]
            .transpose(2, 3, 1, 0).astype(np.float32),
            "bias": np.zeros((d,), np.float32),
        },
    }
    pos = sd.get(f"{prefix}.positional_embedding")
    if pos is not None and pos.shape[0] == 1 + vit.pretrain_grid ** 2:
        tree["pos_embed"] = pos[None].astype(np.float32)
    prev = -1
    for s, hook in enumerate(vit.hooks):
        blocks = [block(i) for i in range(prev + 1, hook + 1)]
        tree[f"seg{s}"] = {"blocks": _stack(blocks)}
        prev = hook
    return tree


def convert_torchvision_resnet(
    sd: Dict[str, np.ndarray], layers: Tuple[int, ...] = (3, 4, 23, 3),
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet50/101 state_dict (bare naming: conv1, bn1,
    layer{1..4}.{b}.*) -> ResNetBackbone (params, batch_stats). Feeds
    the HSNet frozen backbone (reference: fewshot_data/model/hsnet.py
    loads torchvision resnet)."""
    p = prefix
    params: Dict[str, Any] = {"conv1": _conv(sd, f"{p}conv1", bias=False)}
    stats: Dict[str, Any] = {}
    pb, sb = _bn(sd, f"{p}bn1")
    params["bn1"], stats["bn1"] = pb, sb
    for stage in range(4):
        for b in range(layers[stage]):
            key = f"{p}layer{stage + 1}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = _conv(sd, f"{key}.conv{ci}", bias=False)
                pbn, sbn = _bn(sd, f"{key}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = pbn, sbn
            if f"{key}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{key}.downsample.0",
                                        bias=False)
                pbn, sbn = _bn(sd, f"{key}.downsample.1")
                bp["down_bn"], bs["down_bn"] = pbn, sbn
            params[f"layer{stage + 1}_block{b}"] = bp
            stats[f"layer{stage + 1}_block{b}"] = bs
    return params, stats


# ---------------------------------------------------------------------------
# tensor-parallel (head-major) attention param layout
# ---------------------------------------------------------------------------

def segments_to_single_scan(params):
    """vit/seg0..segN stacked block params -> vit/segall with the
    leading (scan) axes concatenated in block order, for
    `ViTConfig.single_scan=True` (one whole-depth scan with streamed
    taps). Pure concatenation; inverse split is the hook-length
    partition of axis 0."""
    import re as _re

    import jax

    vit = dict(params["vit"])
    seg_names = sorted(
        (k for k in vit if _re.fullmatch(r"seg\d+", k)),
        key=lambda s: int(s[3:]))
    trees = [vit.pop(s)["blocks"] for s in seg_names]

    def cat(*leaves):
        if isinstance(leaves[0], np.ndarray):
            return np.concatenate(leaves, axis=0)
        import jax.numpy as jnp

        return jnp.concatenate(leaves, axis=0)

    vit["segall"] = {"blocks": jax.tree_util.tree_map(cat, *trees)}
    out = dict(params)
    out["vit"] = vit
    return out


def to_tp_layout(params, num_heads: int):
    """Flat attention params -> head-major TP layout (pure reshapes).

    Wherever an `attn` module holds the flat fused layout
    (qkv kernel (..., D, 3D) / bias (..., 3D); proj kernel (..., D, D)),
    rewrite to the `tp_layout=True` shapes: qkv kernel (..., D, 3, H, hd),
    bias (..., 3, H, hd), proj kernel (..., H, hd, D). Leading scan axes
    are preserved. Inverse: `from_tp_layout`."""

    def reshape(a, shape):
        # works on np arrays, jax arrays AND tracers (so the flagship
        # AOT dryrun can run this under jax.eval_shape)
        if isinstance(a, np.ndarray):
            return a.reshape(shape)
        import jax.numpy as jnp

        return jnp.reshape(a, shape)

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "attn" and isinstance(v, dict)
                    and "qkv" in v and "proj" in v
                    and "kernel" in v.get("qkv", {})):
                qk = v["qkv"]["kernel"]
                d = qk.shape[-2]
                h = num_heads
                hd = d // h
                qb = v["qkv"]["bias"]
                pk = v["proj"]["kernel"]
                out[k] = {
                    "qkv": {
                        "kernel": reshape(qk, (*qk.shape[:-1], 3, h, hd)),
                        "bias": reshape(qb, (*qb.shape[:-1], 3, h, hd)),
                    },
                    "proj": {
                        "kernel": reshape(pk, (*pk.shape[:-2], h, hd,
                                               pk.shape[-1])),
                        "bias": v["proj"]["bias"],
                    },
                }
            else:
                out[k] = rec(v)
        return out

    return rec(params)


def from_tp_layout(params, num_heads: int):
    """Inverse of `to_tp_layout`: head-major -> flat fused layout."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "attn" and isinstance(v, dict)
                    and "qkv" in v and "proj" in v
                    and getattr(np.asarray(v["qkv"]["kernel"]), "ndim", 0)
                    >= 4):
                qk = np.asarray(v["qkv"]["kernel"])
                d = qk.shape[-4]
                qb = np.asarray(v["qkv"]["bias"])
                pk = np.asarray(v["proj"]["kernel"])
                out[k] = {
                    "qkv": {
                        "kernel": qk.reshape(*qk.shape[:-3], 3 * d),
                        "bias": qb.reshape(*qb.shape[:-3], 3 * d),
                    },
                    "proj": {
                        "kernel": pk.reshape(*pk.shape[:-3], d,
                                             pk.shape[-1]),
                        "bias": v["proj"]["bias"],
                    },
                }
            else:
                out[k] = rec(v)
        return out

    return rec(params)


# ---------------------------------------------------------------------------
# serving-time position-embedding pre-resize
# ---------------------------------------------------------------------------

def presize_pos_embed(params, cfg: LSegConfig, h: int, w: int):
    """Bake the pos-embed bilinear resize for a fixed crop into the
    serving tree.

    `DenseViT` resizes the stored (pretrain_grid²+1)-token position
    embedding to the runtime (H/p, W/p) grid inside every forward
    (reference semantics: _resize_pos_embed, lseg_vit.py:149-163,
    align_corners=False). The resize result depends only on the params
    and the static crop shape, but params are jit ARGUMENTS (CLAUDE.md
    convention), so XLA re-runs the interp matmuls + grid-slice copies
    every step (~0.4 ms/step at the flagship shape, profiled r4).

    For fixed-crop serving this applies the identical resize ONCE on
    host, returning (new_params, new_cfg) where new_cfg.vit carries
    pretrain_grid == H/p so the in-model resize is skipped (exact same
    embedding values — same resize_bilinear call). Requires a square
    target grid; returns the inputs unchanged if the grid already
    matches or is non-square.
    """
    import jax.numpy as jnp

    from lseg_tpu.ops.resize import resize_bilinear

    vit_cfg = cfg.vit
    if vit_cfg is None:
        return params, cfg
    p = vit_cfg.patch_size
    gh, gw = h // p, w // p
    g0 = vit_cfg.pretrain_grid
    if gh != gw or (gh, gw) == (g0, g0):
        return params, cfg

    vit = dict(params["vit"])
    pos = jnp.asarray(vit["pos_embed"], jnp.float32)
    d = pos.shape[-1]
    pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
    pos_grid = pos_grid.reshape(1, g0, g0, d)
    pos_grid = resize_bilinear(pos_grid, gh, gw, align_corners=False)
    pos_grid = pos_grid.reshape(1, gh * gw, d)
    vit["pos_embed"] = jnp.concatenate([pos_tok, pos_grid], axis=1)

    import dataclasses

    new_cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(vit_cfg, pretrain_grid=gh))
    return {**params, "vit": vit}, new_cfg
