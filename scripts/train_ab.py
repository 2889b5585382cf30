"""Interleaved A/B of flagship TRAIN-step time on the real TPU.

Variants are remat policies for the scanned ViT blocks:
  full  — nn.remat default (recompute everything; round-1 baseline,
          467 ms/step at batch 8)
  dots  — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
          (keep matmul outputs, recompute only elementwise chains)
  none  — no remat (reference point; may OOM at batch 8 on one chip)
  flash — full remat + attn_impl='flashflat' with the Pallas custom
          VJP (ops/pallas_attention.flash_attention_flat_vjp): the
          XLA backward materializes the (N,H,T,T) score tensor in HBM
          (~418 MB at batch 8 flagship) several times; the kernel
          recomputes scores in VMEM both directions.
  flashdots — flash + the dots remat policy.

Usage: python scripts/train_ab.py [--batch=8] [--iters=4] [--reps=2]
       [--variants=full,flash]
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lseg_tpu.config import get_config
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.train.optim import make_optimizer
from lseg_tpu.train.state import create_train_state
from lseg_tpu.train.step import make_train_step

POLICIES = {
    "full": (True, None, None),
    "dots": (True,
             jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
             None),
    "none": (False, None, None),
    "flash": (True, None, "flashflat"),
    "flashdots": (
        True,
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "flashflat"),
}


def main() -> None:
    batch, iters, reps = 8, 4, 2
    names = ["full", "dots"]
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--iters="):
            iters = int(arg.split("=")[1])
        elif arg.startswith("--reps="):
            reps = int(arg.split("=")[1])
        elif arg.startswith("--variants="):
            names = arg.split("=")[1].split(",")

    cfg = get_config("clip_vitl16_384")
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    img = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)
    tgt = jax.random.randint(key, (batch, 480, 480), 0, 150, jnp.int32)
    step_fn = make_train_step(ignore_index=-1)

    runners = {}
    for name in names:
        remat, policy, attn = POLICIES[name]
        vcfg = cfg
        if attn is not None:
            import dataclasses
            vcfg = dataclasses.replace(
                cfg, vit=dataclasses.replace(cfg.vit, attn_impl=attn))
        model = LSegNet(vcfg, dtype=jnp.bfloat16, remat=remat,
                        remat_policy=policy)
        v = jax.jit(model.init)(key, x1, txt)
        tx = make_optimizer(base_lr=0.004, max_steps=24000)
        state = create_train_state(model, v, tx)

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(st, im, tg, tt, n):
            def body(i, s):
                s2, _ = step_fn(
                    s, {"image": im + i.astype(jnp.float32) * 1e-6,
                        "target": tg}, tt)
                return s2
            return jax.lax.fori_loop(0, n, body, st)

        def timed(n, run=run, state=state):
            t0 = time.perf_counter()
            st = run(state, img, tgt, txt, n)
            float(jnp.sum(st.step))  # scalar fetch forces execution
            return time.perf_counter() - t0

        try:
            t0 = time.perf_counter()
            timed(1)
            timed(1 + iters)
            print(f"# compiled {name} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            runners[name] = timed
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": str(e)[:160]}), flush=True)

    for rep in range(reps):
        for name, timed in runners.items():
            t1 = min(timed(1), timed(1))
            tn = min(timed(1 + iters), timed(1 + iters))
            per = (tn - t1) / iters
            print(json.dumps({
                "rep": rep, "variant": name,
                "ms_per_step": round(per * 1e3, 1),
                "img_per_sec": round(batch / per, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
