"""Capture and aggregate a TPU profile of one bench variant.

Writes a perfetto trace via jax.profiler (works over the axon relay,
round-1 finding), then aggregates device-side ph=='X' events by op name.

Usage: python scripts/profile_tpu.py [--variant=base] [--batch=8]
       [--steps=3] [--top=40]
"""
from __future__ import annotations

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

from ab_tpu import VARIANTS  # noqa: E402  (same directory)


def main() -> None:
    variant, batch, steps, top = "base", 8, 3, 40
    for arg in sys.argv[1:]:
        if arg.startswith("--variant="):
            variant = arg.split("=")[1]
        elif arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg.startswith("--top="):
            top = int(arg.split("=")[1])

    cfg, model, prep, vfwd = VARIANTS[variant]()
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    v = jax.jit(model.init)(key, x1, txt)
    v = prep(dict(v))
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    @jax.jit
    def fwd(vv, xx, tt):
        return jnp.sum(vfwd(vv, xx, tt), dtype=jnp.int32)

    int(fwd(v, x, txt))  # compile + warm
    logdir = f"/tmp/lseg_prof_{variant}"
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            int(fwd(v, x, txt))

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
    print(f"# variant={variant} steps={steps} "
          f"device-total {total:.1f} ms ({total / steps:.1f} ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / steps:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
