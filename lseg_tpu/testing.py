"""Tiny model configs shared by the test suite and the multi-chip dryrun.

Shapes are chosen so every architectural path (4-level reassemble with
up/identity/down resampling, fusion cascade, correlation head) is
exercised at toy cost on a CPU mesh.
"""

from __future__ import annotations

from lseg_tpu.config import (
    CLIPTextConfig,
    LSegConfig,
    ResNetConfig,
    ViTConfig,
)

# vocab covers ClipBPETokenizer.for_tests() ids (512 byte symbols +
# merges + specials ≈ 525).
TINY_TEXT = CLIPTextConfig(
    vocab_size=1024, context_length=16, width=32, layers=2, heads=2,
    embed_dim=64,
)


def tiny_vit_config(**kw) -> LSegConfig:
    import dataclasses

    base = LSegConfig(
        backbone="tiny_vit",
        features=32,
        out_c=64,
        vit=ViTConfig(
            patch_size=16,
            embed_dim=64,
            depth=4,
            num_heads=2,
            # depth 4 / one block per segment: halves the dominant
            # per-test compile+run cost on 1-CPU hosts while still
            # exercising the segmented scan, all 4 reassemble levels
            # and the fusion cascade
            hooks=(0, 1, 2, 3),
            post_channels=(16, 32, 64, 64),
            resample=(4.0, 2.0, 1.0, 0.5),
            pretrain_grid=4,
        ),
        text=TINY_TEXT,
    )
    return dataclasses.replace(base, **kw) if kw else base


def tiny_rn_config(**kw) -> LSegConfig:
    import dataclasses

    base = LSegConfig(
        backbone="tiny_rn",
        features=32,
        out_c=64,
        resnet=ResNetConfig(layers=(1, 1, 1, 1)),
        text=TINY_TEXT,
    )
    return dataclasses.replace(base, **kw) if kw else base


def save_tree_npz(path, tree) -> None:
    """Flatten a nested dict-of-arrays to one compressed .npz ('/'
    joined keys). Used for committed test fixtures (e.g. the trained
    tiny checkpoint that gates the fast-int8 stack)."""
    import numpy as np

    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    visit("", tree)
    np.savez_compressed(path, **flat)


def load_tree_npz(path) -> dict:
    """Inverse of save_tree_npz."""
    import numpy as np

    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def train_tiny_checkpoint(steps: int = 1200):
    """Train the tiny head_dim-64 LSegNet to convergence on the
    synthetic set with the parity config (the recipe measured to break
    the background-collapse: plain Adam 1e-3 over 128 images — see
    tests/test_quant.py::test_trained_model_fast_int8_miou_parity).
    Returns ({'params', 'batch_stats'}, final_loss). ~15 min on a
    1-CPU host; the result is committed as tests/golden/trained_tiny.npz
    so the suite never retrains."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lseg_tpu.data.synthetic import SyntheticSegDataset
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.train.state import create_train_state
    from lseg_tpu.train.step import make_train_step

    base = tiny_vit_config()
    cfg = dataclasses.replace(
        base, vit=dataclasses.replace(base.vit, embed_dim=128,
                                      num_heads=2))
    nc, n_train = 4, 128
    ds = SyntheticSegDataset(n=n_train + 8, size=64, num_classes=nc)
    batches = [
        {"image": jnp.asarray(np.stack(
            [ds[i]["image"] for i in range(lo, lo + 8)])),
         "target": jnp.asarray(np.stack(
             [ds[i]["target"] for i in range(lo, lo + 8)]))}
        for lo in range(0, n_train, 8)
    ]
    rng = np.random.RandomState(0)
    txt = jnp.asarray(rng.randn(nc, cfg.out_c).astype(np.float32))
    model = LSegNet(cfg)  # fp32 training, parity semantics
    variables = model.init(
        jax.random.PRNGKey(0), batches[0]["image"][:1], txt, train=True)
    state = create_train_state(model, variables, optax.adam(1e-3))
    train_step = jax.jit(make_train_step(-1, 1), donate_argnums=(0,))
    metrics = None
    for step in range(steps):
        state, metrics = train_step(
            state, batches[step % len(batches)], txt)
    return ({"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
            float(metrics["loss"]))
