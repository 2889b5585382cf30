"""Sharding tests on the 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8): dp+tp train step executes and
matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_state,
)
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def test_mesh_and_param_shardings():
    mesh = create_mesh(n_data=4, n_model=2)
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((4, cfg.out_c))
    variables = model.init(jax.random.PRNGKey(0), x, txt)
    sh = param_shardings(variables["params"], mesh)
    qkv = sh["vit"]["seg0"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, None, "model")
    cls = sh["vit"]["cls_token"]
    assert cls.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_matches_single_device():
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 64, 64, 3))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (8, 64, 64), 0, 4)
    txt = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.out_c))
    variables = model.init(key, x, txt, train=True)
    tx = make_optimizer(base_lr=0.01, max_steps=100, batch_size=8)

    step_fn = make_train_step(ignore_index=-1)

    # single device
    s0 = create_train_state(model, variables, tx)
    s0, m0 = jax.jit(step_fn)(s0, {"image": x, "target": tgt}, txt)

    # 4x2 mesh
    mesh = create_mesh(n_data=4, n_model=2)
    s1 = create_train_state(model, variables, tx)
    s1 = jax.device_put(s1, shard_state(s1, mesh))
    batch = {
        "image": jax.device_put(x, batch_sharding(mesh)),
        "target": jax.device_put(tgt, batch_sharding(mesh)),
    }
    s1, m1 = jax.jit(step_fn)(s1, batch, jax.device_put(txt, replicated(mesh)))

    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s0.params),
        jax.tree_util.tree_leaves(s1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # flagship AOT lowering is covered by tests/test_flagship_aot.py
    mod.dryrun_multichip(8, flagship_aot=False)


def test_sharded_tta_eval_matches_single_device():
    """Eval path sharded over the data axis: the TTA evaluator's crop
    forward runs with its (2g) crop batch sharded over an 8-device data
    mesh and must reproduce the unsharded label map exactly."""
    from lseg_tpu.engine.serve import make_logits_fn
    from lseg_tpu.engine.tta import MultiScaleEvaluator, TTAProtocol

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    image = rng.randn(80, 100, 3).astype(np.float32)
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), txt
    )
    proto = TTAProtocol(base_size=72, crop_size=64,
                        scales=(0.5, 1.0, 1.5), flip=True)

    plain_fn = make_logits_fn(model, variables)
    ev0 = MultiScaleEvaluator(plain_fn, 4, proto)
    ref = ev0(image, txt)

    mesh = create_mesh(n_data=8, n_model=1)
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)
    v_sh = jax.device_put(variables, param_shardings(variables, mesh))

    def sharded_fn(images, text_features):
        # crop batch = 2 * crops_per_step = 8 -> one crop per device
        return plain_fn.func(
            v_sh, jax.device_put(images, bsh),
            jax.device_put(text_features, rsh),
        )

    ev1 = MultiScaleEvaluator(sharded_fn, 4, proto)
    out = ev1(image, txt)
    np.testing.assert_array_equal(out, ref)


def test_fast_serving_int8_shards_over_data_axis():
    """The full fast-serving stack (flashlnq fused kernel + LN2-fused
    quantize + int8 decoder) runs under a data-sharded mesh — the
    multi-chip serving path."""
    import dataclasses

    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from lseg_tpu.config import fast_serving
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    base = tiny_vit_config()
    cfg = fast_serving(
        dataclasses.replace(
            base, vit=dataclasses.replace(
                base.vit, embed_dim=128, num_heads=2)),
        quant="static")
    assert cfg.vit.attn_impl == "flashlnq"
    assert cfg.vit.ln_quant_fused
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    cfg0 = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, attn_impl="xla",
                                     quant_int8=False),
        decoder_quant=False)
    v0 = LSegNet(cfg0, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, t)
    vq = dict(v0)
    vq["params"] = quantize_tree(v0["params"], decoder=True)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda v, xx, tt: jnp.argmax(m.apply(v, xx, tt), -1)
    )(vq, xs, t)
    assert out.shape == (8, 64, 64)
    # unsharded reference agrees (argmax can flip on random-init ties
    # under different partitioned reduction orders -> near-exact)
    ref = jnp.argmax(m.apply(vq, x, t), -1)
    agree = (np.asarray(out) == np.asarray(ref)).mean()
    assert agree > 0.97, agree  # random-init margins ~0


def test_labelset_sharded_predictor_matches_unsharded():
    """make_labelset_sharded_predictor (K sharded over the mesh for the
    FSS-1000-style huge-label-set regime) matches the single-device
    predictor exactly, including argmax tie-breaking."""
    from lseg_tpu.engine.serve import (
        make_labelset_sharded_predictor,
        make_predictor,
    )
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.parallel import create_mesh
    from lseg_tpu.testing import tiny_vit_config

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    # K=64 = 8 labels per device on the 8-device mesh
    txt = jnp.asarray(rng.randn(64, cfg.out_c).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, txt)

    ref = make_predictor(model, v)(x, txt)
    mesh = create_mesh(n_data=8, n_model=1)
    pred = make_labelset_sharded_predictor(model, v, mesh)
    out = pred(x, txt)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    import pytest

    with pytest.raises(ValueError, match="must divide"):
        pred(x, txt[:63])


def test_data_sharded_serving_has_no_collectives():
    """Multi-chip serving scales linearly per chip:
    `make_data_sharded_predictor` (shard_map over the data axis, the
    exact kernel gate set of bench.py's config: flashlnq +
    ln_quant_fused + fused argmax head) compiles to a graph with NO
    cross-device collectives, and reproduces the unsharded label map
    exactly (VERDICT r3 item 9; replaces the reference's
    replicate-and-thread eval dispatch,
    additional_utils/models.py:183-248).

    Plain jit-with-shardings is NOT collective-free here: Pallas
    kernels are opaque to the SPMD partitioner, which replicates them
    behind per-kernel all-gathers of the batch — that's why the
    predictor exists."""
    import dataclasses
    import re

    import numpy as np
    from jax.sharding import Mesh

    from lseg_tpu.config import fast_serving
    from lseg_tpu.engine.serve import make_data_sharded_predictor
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import quantize_tree
    from lseg_tpu.testing import tiny_vit_config

    from lseg_tpu.ops.quant import calibrate_act_scales

    base = tiny_vit_config()
    # static_cal: calibrated (batch-independent) activation scales, as
    # in bench.py — dynamic per-tensor scales would couple the batch
    # (amax over a shard != global amax) and break shard exactness
    cfg = fast_serving(
        dataclasses.replace(
            base, vit=dataclasses.replace(
                base.vit, embed_dim=128, num_heads=2)),
        quant="static_cal")
    assert cfg.vit.attn_impl == "flashlnq" and cfg.vit.ln_quant_fused
    assert cfg.vit.patch_fused and cfg.head_fused
    m = LSegNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
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
    vq = calibrate_act_scales(m, vq, x, t)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    pred = make_data_sharded_predictor(m, vq, mesh)

    out = pred(x, t)
    assert out.shape == (8, 64, 64)
    # exact agreement vs the per-image LOCAL program (identical jaxpr
    # to what each shard runs: jitted batch-1 apply). Batch-8 or eager
    # programs are different XLA compilations whose reassociation can
    # flip random-init argmax ties ~1%, so they are not the oracle.
    jit1 = jax.jit(
        lambda v, xx, tt: m.apply(v, xx, tt, return_argmax=True))
    ref = np.concatenate([
        np.asarray(jit1(vq, x[i:i + 1], t))
        for i in range(x.shape[0])
    ], axis=0)
    np.testing.assert_array_equal(np.asarray(out), ref)

    import jax as _jax

    from jax.sharding import PartitionSpec as P

    def _local(v, xx, tt):
        return m.apply(v, xx, tt, return_argmax=True)

    hlo_mods = _jax.jit(_jax.shard_map(
        _local, mesh=mesh, in_specs=(P(), P("data"), P()),
        out_specs=P("data"), check_vma=False,
    )).lower(vq, x, t).compile().runtime_executable().hlo_modules()
    hlo = "\n".join(mod.to_string() for mod in hlo_mods)
    bad = re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)\b", hlo)
    assert not bad, f"cross-device collectives in serving graph: {set(bad)}"

    import pytest

    with pytest.raises(ValueError, match="must divide"):
        pred(x[:3], t)
