"""Stage-cost accounting by interleaved slope timing (one process):

  vit    — DenseViT encoder only (24 blocks + taps)
  emb    — full backbone + decoder + head1 (pixel embeddings)
  full   — + correlate + x2 upsample + argmax (the bench path)

Differences give exact end-to-end stage costs, immune to the
fusion-name misattribution that a flat profile aggregation suffers
(peeled scan iterations show up as standalone fusions).
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

from lseg_tpu.config import fast_serving, get_config
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.models.vit import DenseViT


def main() -> None:
    batch, iters, reps = 8, 12, 3
    int8 = "--int8" in sys.argv
    cfg = fast_serving(get_config("clip_vitl16_384"),
                       quant="static" if int8 else False)
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    vit = DenseViT(cfg.vit, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    v = jax.jit(model.init)(key, jnp.zeros((1, 480, 480, 3)), txt)
    if int8:
        from lseg_tpu.ops.quant import quantize_tree
        v = {**v, "params": quantize_tree(v["params"], decoder=True)}
    vv = {"params": v["params"]["vit"]}
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    def f_vit(vars_, xx, tt):
        taps, _ = vit.apply({"params": vars_["params"]["vit"]}, xx)
        return sum(jnp.sum(t, dtype=jnp.float32) for t in taps)

    def f_emb(vars_, xx, tt):
        return jnp.sum(model.apply(vars_, xx, None),
                       dtype=jnp.float32)

    def f_full(vars_, xx, tt):
        return jnp.sum(
            jnp.argmax(model.apply(vars_, xx, tt), axis=-1)
        ).astype(jnp.float32)

    runners = {}
    for name, fn in (("vit", f_vit), ("emb", f_emb), ("full", f_full)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(vars_, xx, tt, n, fn=fn):
            def body(i, acc):
                xi = xx + (i.astype(jnp.float32) * 1e-6)
                return acc + fn(vars_, xi, tt)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def timed(n, run=run):
            t0 = time.perf_counter()
            float(run(v, x, txt, n))
            return time.perf_counter() - t0

        timed(1)
        timed(1 + iters)
        runners[name] = timed

    best = {n: 1e9 for n in runners}
    for rep in range(reps):
        for name, timed in runners.items():
            t1 = min(timed(1), timed(1))
            tn = min(timed(1 + iters), timed(1 + iters))
            per = (tn - t1) / iters * 1e3
            best[name] = min(best[name], per)
            print(json.dumps({"rep": rep, "stage": name,
                              "ms": round(per, 2)}), flush=True)
    print("# stage costs (ms):", flush=True)
    print(json.dumps({
        "vit": round(best["vit"], 2),
        "decoder+head1": round(best["emb"] - best["vit"], 2),
        "correlate+up+argmax": round(best["full"] - best["emb"], 2),
        "full": round(best["full"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
