"""BN-folding serving transform: the folded use_bn=False model must
reproduce the eval-mode use_bn=True model (exact affine algebra)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.testing import tiny_rn_config, tiny_vit_config
from lseg_tpu.utils.fold_bn import fold_bn_tree


def _nontrivial_stats(variables, key):
    """Randomize batch_stats so folding is actually exercised (init
    stats are mean=0/var=1, which fold to identity)."""
    leaves, treedef = jax.tree_util.tree_flatten(variables["batch_stats"])
    rng = np.random.RandomState(7)
    new = []
    for leaf in leaves:
        arr = rng.randn(*leaf.shape).astype(np.float32)
        new.append(jnp.asarray(np.abs(arr) + 0.5))
    return jax.tree_util.tree_unflatten(treedef, new)


def test_fold_bn_matches_eval_model_vit():
    cfg = tiny_vit_config()
    assert cfg.use_bn
    m = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    v = {"params": v["params"],
         "batch_stats": _nontrivial_stats(v, 7)}
    ref = np.asarray(m.apply(v, x, txt))

    folded = fold_bn_tree(v["params"], v["batch_stats"])
    mf = LSegNet(dataclasses.replace(cfg, use_bn=False))
    # structure check: folded tree == the no-bn model's own init
    want = jax.tree_util.tree_map(
        lambda a: a.shape,
        mf.init(jax.random.PRNGKey(0), x, txt)["params"])
    got = jax.tree_util.tree_map(lambda a: a.shape, folded)
    assert want == got
    out = np.asarray(mf.apply({"params": folded}, x, txt))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fold_bn_matches_eval_model_resnet():
    cfg = tiny_rn_config()
    m = LSegNet(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rng.randn(3, cfg.out_c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, txt)
    v = {"params": v["params"],
         "batch_stats": _nontrivial_stats(v, 3)}
    ref = np.asarray(m.apply(v, x, txt))
    # the resnet backbone keeps its BN modules (no use_bn knob), so fold
    # only the decoder stats: folding scope == the stats you pass
    decoder_stats = {k: s for k, s in v["batch_stats"].items()
                     if k != "resnet"}
    folded = fold_bn_tree(v["params"], decoder_stats)
    assert "bn1" in folded["resnet"]
    assert "bn1" not in folded["refinenet1"]["rcu1"]
    mf = LSegNet(dataclasses.replace(cfg, use_bn=False))
    vf = {"params": folded,
          "batch_stats": {"resnet": v["batch_stats"]["resnet"]}}
    out = np.asarray(mf.apply(vf, x, txt))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
