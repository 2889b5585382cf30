"""Probe: does XLA on v5e lower int4-weight matmuls at a rate beyond
int8? int8 already runs the ViT projections at ~2x bf16; int4 weights
(jnp.int4, 2x denser) would halve the weight HBM stream and may run the
MXU at 2x int8 for s4xs4.

Measures the fc1 serving shape (7232, 1024) x (1024, 4096) standalone:
  bf16        — baseline
  s8s8        — current static-int8 regime
  s4s8        — int4 weights, int8 activations
  s4s4        — both int4
Slope timing (fori_loop, scalar fetch) like ab_tpu.py.
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

M, K, N = 7232, 1024, 4096


def main() -> None:
    iters = 30
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (M, K), jnp.bfloat16)
    wf = jax.random.normal(key, (K, N), jnp.bfloat16)
    x8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    x4 = x8.astype(jnp.int4)
    w4 = w8.astype(jnp.int4)

    def dot(a, b, pt):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pt,
        )

    cases = {
        "bf16": (xf, wf, jnp.float32),
        "s8s8": (x8, w8, jnp.int32),
        "s4s8": (x8, w4, jnp.int32),
        "s4s4": (x4, w4, jnp.int32),
    }

    for name, (a, b, pt) in cases.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(aa, bb, n, pt=pt):
            def body(i, acc):
                y = dot(aa, bb, pt)
                return acc + y[i % 8, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def timed(n, run=run, a=a, b=b):
            t0 = time.perf_counter()
            float(run(a, b, n))
            return time.perf_counter() - t0

        try:
            timed(1)
            timed(1 + iters)
            t1 = min(timed(1), timed(1))
            tn = min(timed(1 + iters), timed(1 + iters))
            per = (tn - t1) / iters * 1e3
            tops = 2 * M * K * N / (per * 1e-3) / 1e12
            print(json.dumps({"case": name, "ms": round(per, 3),
                              "tops": round(tops, 1)}), flush=True)
        except Exception as e:  # unsupported lowering -> report, move on
            print(json.dumps({"case": name,
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
