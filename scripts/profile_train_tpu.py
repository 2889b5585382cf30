"""Capture and aggregate a TPU profile of the flagship TRAIN step.

Same perfetto capture/aggregation as profile_tpu.py, but over
make_train_step (fwd+bwd+SGD, remat) with the train.py default
config (flash custom-VJP attention, full-recompute remat policy).

Usage: python scripts/profile_train_tpu.py [--variant=flash]
       [--batch=8] [--steps=2] [--top=50]
Variants are scripts/train_ab.py's remat policies.

MEASUREMENT HAZARD: this profiles SINGLE dispatches, which carry
~75 ms of relay dispatch overhead on top of the true step time
(measured: profile shows 294.6 ms/step while train_ab's slope method
gives 219.7 for the same flash variant on the same day). Use the
per-op BREAKDOWN from here and train_ab.py for the step TIME.
"""
from __future__ import annotations

import dataclasses
import functools
import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from train_ab import POLICIES  # noqa: E402  (same directory)

from lseg_tpu.config import get_config
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.train.optim import make_optimizer
from lseg_tpu.train.state import create_train_state
from lseg_tpu.train.step import make_train_step


def main() -> None:
    variant, batch, steps, top = "flash", 8, 2, 50
    for arg in sys.argv[1:]:
        if arg.startswith("--variant="):
            variant = arg.split("=")[1]
        elif arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg.startswith("--top="):
            top = int(arg.split("=")[1])

    remat, policy, attn = POLICIES[variant]
    cfg = get_config("clip_vitl16_384")
    if attn is not None:
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, attn_impl=attn))
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    img = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)
    tgt = jax.random.randint(key, (batch, 480, 480), 0, 150, jnp.int32)

    model = LSegNet(cfg, dtype=jnp.bfloat16, remat=remat,
                    remat_policy=policy)
    v = jax.jit(model.init)(key, x1, txt)
    state = create_train_state(
        model, v, make_optimizer(base_lr=0.004, max_steps=24000))
    step_fn = jax.jit(make_train_step(ignore_index=-1))

    def one(st):
        st2, metrics = step_fn(st, {"image": img, "target": tgt}, txt)
        float(metrics["loss"])  # force execution
        return st2

    state = one(state)  # compile + warm
    logdir = f"/tmp/lseg_prof_train_{variant}"
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            state = one(state)

    traces = sorted(glob.glob(
        f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace written", file=sys.stderr)
        sys.exit(1)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    pid_names = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n}

    agg = defaultdict(float)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in tpu_pids:
            agg[ev["name"]] += ev.get("dur", 0) / 1e3
            total += ev.get("dur", 0) / 1e3
    print(f"# train variant={variant} steps={steps} "
          f"device-total {total:.1f} ms ({total / steps:.1f} ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / steps:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
