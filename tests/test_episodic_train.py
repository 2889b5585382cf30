"""Episodic (ZS) training step: binary CE decreases on a fixed episode
batch; ignore regions are excluded from the loss."""

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.train import create_train_state, make_optimizer
from lseg_tpu.train.episodic import make_episodic_train_step


def test_episodic_train_loss_decreases():
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    key = jax.random.PRNGKey(0)
    b = 2
    batch = {
        "query_img": jax.random.normal(key, (b, 64, 64, 3)),
        "query_mask": jax.random.randint(
            jax.random.PRNGKey(1), (b, 64, 64), 0, 2
        ),
        "query_ignore": jnp.zeros((b, 64, 64), bool),
    }
    txt_pairs = jax.random.normal(jax.random.PRNGKey(2), (b, 2, cfg.out_c))
    variables = model.init(key, batch["query_img"], None, train=True)
    tx = make_optimizer(base_lr=0.004, max_steps=100, batch_size=16)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_episodic_train_step(cfg.logit_scale))

    state, m0 = step(state, batch, txt_pairs)
    for _ in range(6):
        state, m = step(state, batch, txt_pairs)
    assert float(m["loss"]) < float(m0["loss"])
    assert m["inter"].shape == (b, 2)


def test_episodic_ignore_region_excluded():
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, 64, 64, 3))
    variables = model.init(key, img, None, train=True)
    tx = make_optimizer(base_lr=0.0, max_steps=10, batch_size=16)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_episodic_train_step(cfg.logit_scale))
    txt_pairs = jax.random.normal(jax.random.PRNGKey(2), (1, 2, cfg.out_c))

    # identical ignore mask, different target values UNDER it:
    # the loss must be identical (ignored pixels contribute nothing)
    ignore = jnp.zeros((1, 64, 64), bool).at[:, :32].set(True)
    mask_a = jnp.zeros((1, 64, 64), jnp.int32)
    mask_b = mask_a.at[:, :32].set(1)
    _, m1 = step(state, {"query_img": img, "query_mask": mask_a,
                         "query_ignore": ignore}, txt_pairs)
    _, m2 = step(state, {"query_img": img, "query_mask": mask_b,
                         "query_ignore": ignore}, txt_pairs)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
