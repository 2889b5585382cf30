"""Multi-host (multi-process) training simulation: 2 processes x 2
virtual CPU devices run the REAL distributed bring-up
(jax.distributed.initialize + gloo collectives + per-process batch
shards) and must agree with each other and with the single-process
result on the same data."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    nproc, port = 2, "29753"
    env = dict(os.environ)
    # workers configure their own platform/devices; scrub the test
    # session's CPU forcing so jax.config in the worker wins
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), port,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    losses = [
        float(open(tmp_path / f"loss_{i}.txt").read()) for i in range(nproc)
    ]
    assert losses[0] == losses[1]

    # single-process oracle on the same data/model
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.testing import tiny_vit_config
    from lseg_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 4, (8, 64, 64)).astype(np.int32))
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), txt, train=True)
    tx = make_optimizer(base_lr=0.01, max_steps=10, batch_size=8)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(ignore_index=-1))
    for _ in range(2):
        state, metrics = step(state, {"image": x, "target": t}, txt)
    ref = float(metrics["loss"])
    np.testing.assert_allclose(losses[0], ref, rtol=1e-4, atol=1e-5)
