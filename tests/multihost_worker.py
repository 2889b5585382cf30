"""Multi-host simulation worker: one PROCESS of a 2-process CPU
"cluster" (2 virtual devices each -> 4 global). Exercises the actual
multi-host code path — jax.distributed.initialize + gloo collectives +
per-process batch shards assembled into global arrays — that real
multi-node TPU runs take (reference equivalent: PL DDP over SLURM,
utils.py:51-56, sbatch_run.sh).

Run (from tests/test_multihost.py, or by hand):
    python tests/multihost_worker.py <pid> <nproc> <port> <outdir>
Writes <outdir>/loss_<pid>.txt with the step-2 loss.
"""

import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    sys.path.insert(0, "/root/repo")
    from lseg_tpu.parallel import init_distributed

    init_distributed(f"localhost:{port}", num_processes=nproc,
                     process_id=pid, cpu_devices_per_process=2)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.parallel import create_mesh, shard_state
    from lseg_tpu.testing import tiny_vit_config
    from lseg_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    n_global = len(jax.devices())
    assert n_global == 2 * nproc, n_global
    mesh = create_mesh(n_data=n_global, n_model=1)

    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    global_batch = n_global * 2
    per_proc = global_batch // nproc

    # deterministic data, identical across processes; each process
    # contributes only its slice (the per-process loader-shard pattern)
    rng = np.random.RandomState(0)
    x_all = rng.randn(global_batch, 64, 64, 3).astype(np.float32)
    t_all = rng.randint(0, 4, (global_batch, 64, 64)).astype(np.int32)
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), txt, train=True)
    tx = make_optimizer(base_lr=0.01, max_steps=10,
                        batch_size=global_batch)
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, shard_state(state, mesh))

    lo, hi = pid * per_proc, (pid + 1) * per_proc
    batch = {
        "image": multihost_utils.host_local_array_to_global_array(
            x_all[lo:hi], mesh, P("data")),
        "target": multihost_utils.host_local_array_to_global_array(
            t_all[lo:hi], mesh, P("data")),
    }

    step = jax.jit(make_train_step(ignore_index=-1), donate_argnums=(0,))
    loss = None
    for _ in range(2):
        state, metrics = step(state, batch, txt)
        loss = metrics["loss"]
    # the loss is fully replicated across the global mesh, so each
    # process reads the same scalar from its local replica
    loss = float(loss)
    with open(f"{outdir}/loss_{pid}.txt", "w") as f:
        f.write(f"{loss:.6f}\n")
    print(f"proc {pid}: step-2 loss {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
