"""Training-step tests: loss decreases on an overfit batch (the
reference's --dry-run/overfit_batches sanity mode, utils.py:24-26),
gradient accumulation equivalence, and loss/metric correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.ops.losses import cross_entropy, segmentation_loss
from lseg_tpu.ops.metrics import seg_update
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _setup(batch=2, accumulate=1, **cfg_kw):
    cfg = tiny_vit_config(**cfg_kw)
    model = LSegNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 64, 64, 3))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (batch, 64, 64), 0, 4)
    txt = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.out_c))
    variables = model.init(key, x, txt, train=True)
    tx = make_optimizer(base_lr=0.004, max_steps=1000, batch_size=16)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(ignore_index=-1, accumulate=accumulate))
    return state, step, {"image": x, "target": tgt}, txt


def test_overfit_loss_decreases():
    state, step, batch, txt = _setup()
    state, m0 = step(state, batch, txt)
    for _ in range(8):
        state, m = step(state, batch, txt)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 9


def test_grad_accumulation_matches_full_batch():
    # BN-free config: with BatchNorm the micro-batch moments differ from
    # the full-batch ones, so exact equivalence only holds without BN.
    state, step1, batch, txt = _setup(batch=4, accumulate=1, use_bn=False)
    _, step2, _, _ = _setup(batch=4, accumulate=2, use_bn=False)
    s1, m1 = step1(state, batch, txt)
    s2, m2 = step2(state, batch, txt)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_cross_entropy_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    target = rng.randint(-1, 5, (2, 8, 8)).astype(np.int32)
    ours = float(cross_entropy(
        jnp.asarray(logits), jnp.asarray(target), ignore_index=-1
    ))
    theirs = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(target.astype(np.int64)),
        ignore_index=-1,
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_seg_update_counts():
    logits = jnp.asarray(
        np.eye(3, dtype=np.float32)[
            np.array([[0, 1], [2, 1]])
        ]
    )[None]  # (1,2,2,3), argmax = [[0,1],[2,1]]
    target = jnp.asarray(np.array([[[0, 1], [1, -1]]], dtype=np.int32))
    correct, labeled, inter, union = seg_update(
        logits, target, nclass=3, ignore_index=-1
    )
    assert int(labeled) == 3
    assert int(correct) == 2  # (0,0) and (0,1) right; (1,0) wrong
    np.testing.assert_array_equal(np.asarray(inter), [1, 1, 0])
    # pred areas (valid): {0:1, 1:1, 2:1}; tgt areas: {0:1, 1:2}
    np.testing.assert_array_equal(np.asarray(union), [1, 2, 1])


def test_se_and_aux_loss_paths():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    aux = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    se = jnp.asarray(rng.randn(2, 5).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 5, (2, 8, 8)).astype(np.int32))
    base = segmentation_loss(logits, target)
    full = segmentation_loss(
        logits, target, aux_logits=aux, se_logits=se, nclass=5
    )
    assert float(full) != float(base)
    assert np.isfinite(float(full))
