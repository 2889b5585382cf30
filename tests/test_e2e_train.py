"""End-to-end training on the synthetic dataset: the full loop (loader ->
sharded train step -> val metrics -> checkpoint -> resume) on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.data.loader import DataLoader
from lseg_tpu.data.synthetic import SyntheticSegDataset
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.parallel import batch_sharding, create_mesh, shard_state
from lseg_tpu.testing import tiny_vit_config
from lseg_tpu.train import create_train_state, make_optimizer
from lseg_tpu.train.loop import FitConfig, fit


def test_loader_batches_and_order():
    ds = SyntheticSegDataset(n=10, size=32)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=3)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    # deterministic order when shuffle=False
    np.testing.assert_array_equal(
        batches[0]["image"][0], ds[0]["image"]
    )
    np.testing.assert_array_equal(
        batches[1]["target"][3], ds[7]["target"]
    )


def test_fit_synthetic_and_resume(tmp_path):
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    train_ds = SyntheticSegDataset(n=16, size=64, num_classes=4)
    val_ds = SyntheticSegDataset(n=8, size=64, num_classes=4, seed=1)
    txt = jax.random.normal(jax.random.PRNGKey(0), (4, cfg.out_c))

    mesh = create_mesh(n_data=8, n_model=1)
    bsh = batch_sharding(mesh)
    x0 = jnp.zeros((1, 64, 64, 3))
    # keep the template on host: device_put of a committed jax array to a
    # replicated mesh sharding can alias the device-0 buffer, so a donated
    # train step would invalidate `variables` for later reuse
    variables = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), x0, txt, train=True)
    )
    tx = make_optimizer(base_lr=0.02, max_steps=100, batch_size=8)
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, shard_state(state, mesh))

    logs = []
    fit_cfg = FitConfig(
        max_epochs=2, ckpt_dir=str(tmp_path / "ckpt"), log_every=1
    )
    final = fit(
        state,
        DataLoader(train_ds, 8, num_workers=2, sharding=bsh, seed=3),
        txt,
        fit_cfg,
        val_loader=DataLoader(
            val_ds, 8, shuffle=False, num_workers=2, sharding=bsh
        ),
        log=logs.append,
    )
    assert int(final.step) == 4  # 2 epochs x 2 steps
    assert (tmp_path / "ckpt" / "metrics.csv").exists()

    # resume: a fresh state restores to step 4 and continues to 6
    state2 = create_train_state(model, variables, tx)
    state2 = jax.device_put(state2, shard_state(state2, mesh))
    fit_cfg3 = FitConfig(
        max_epochs=3, ckpt_dir=str(tmp_path / "ckpt"), log_every=1
    )
    logs2 = []
    final2 = fit(
        state2,
        DataLoader(train_ds, 8, num_workers=2, sharding=bsh, seed=3),
        txt,
        fit_cfg3,
        log=logs2.append,
    )
    # exact epoch accounting via checkpoint metadata: the last saved
    # epoch was 1, so resume restarts at epoch 2 (not a
    # len(train_loader)-derived guess)
    assert any("resumed from step 4 (epoch 2)" in s for s in logs2)
    assert int(final2.step) == 6

    # training made progress: final params give better val acc than init
    from lseg_tpu.train.step import make_eval_step

    eval_step = jax.jit(make_eval_step(-1))
    batch = next(iter(DataLoader(
        val_ds, 8, shuffle=False, num_workers=2, sharding=bsh
    )))
    m_init = eval_step(
        jax.device_put(
            create_train_state(model, variables, tx),
            shard_state(state, mesh),
        ),
        batch, txt,
    )
    m_final = eval_step(final2, batch, txt)
    acc_init = float(m_init["correct"]) / float(m_init["labeled"])
    acc_final = float(m_final["correct"]) / float(m_final["labeled"])
    assert acc_final > acc_init


def test_loader_set_epoch_reshuffles():
    ds = SyntheticSegDataset(n=16, size=8, num_classes=4)
    dl = DataLoader(ds, 4, num_workers=1, seed=3)
    e0 = list(dl._indices())
    dl.set_epoch(1)
    e1 = list(dl._indices())
    assert sorted(e0) == sorted(e1) and e0 != e1
    dl.set_epoch(0)
    assert list(dl._indices()) == e0


def test_loader_propagates_worker_errors():
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("corrupt sample")
            return {"x": np.zeros(2, np.float32)}

    dl = DataLoader(Broken(), batch_size=4, shuffle=False, num_workers=2)
    import pytest

    with pytest.raises(RuntimeError, match="sample 3"):
        list(dl)


def test_sharded_correlation_matches_unsharded():
    """SURVEY §2.3: for huge K / HW, shard the correlation's pixel rows
    across the mesh — under jit this is just input sharding; XLA keeps
    the text matrix replicated and emits no cross-device traffic."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lseg_tpu.ops.correlation import correlate
    from lseg_tpu.parallel import create_mesh

    mesh = create_mesh(n_data=8, n_model=1)
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(8, 16, 16, 32).astype(np.float32))
    txt = jnp.asarray(rng.randn(1000, 32).astype(np.float32))  # FSS-size K
    ref = np.asarray(correlate(emb, txt))
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P("data")))
    out = jax.jit(correlate)(emb_sh, txt)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    assert out.sharding.spec == P("data")  # rows stay sharded


def test_loader_process_sharding():
    ds = SyntheticSegDataset(n=16, size=16)
    a = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=5,
                   process_count=2, process_index=0)
    b = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=5,
                   process_count=2, process_index=1)
    ia, ib = a._indices(), b._indices()
    assert len(ia) == len(ib) == 8
    assert set(ia).isdisjoint(set(ib))
    assert len(a) == 4  # batches per process
