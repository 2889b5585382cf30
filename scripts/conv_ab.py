"""Interleaved A/B of 3x3-conv formulations at the decoder RCU shape
((8,120,120,256) x 256out) — the profiled fusions run at ~36% of MXU
peak, the single biggest decoder bucket (~13.6 ms of 19.5).

Variants:
  conv   — XLA conv_general_dilated (what the model compiles today)
  shifts — sum of 9 shifted 1x1 matmuls (pad once, slice per tap)
  wide   — conv expressed as 1x1 conv on a channel-concat of 9 shifts

Each runs relu+bias epilogue to mimic the RCU fusion context.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, H, W, C, F = 8, 120, 120, 256, 256


def conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.nn.relu(y + b)


def shifts(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (N, H, W, C))
            part = jnp.einsum(
                "nhwc,cf->nhwf", tap, w[dy, dx],
                preferred_element_type=jnp.float32,
            )
            y = part if y is None else y + part
    return jax.nn.relu(y.astype(jnp.bfloat16) + b)


def wide(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (N, H, W, C))
         for dy in range(3) for dx in range(3)], axis=-1)
    y = jnp.einsum(
        "nhwk,kf->nhwf", taps, w.reshape(9 * C, F),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y.astype(jnp.bfloat16) + b)


def conv_ctx(x, w, b):
    """In-model context: BN-affine + relu fused into the conv input —
    the producer chain gets recomputed for every 3x3 window tap."""
    y = jax.nn.relu(x * 1.03 + 0.11)
    y = jax.lax.conv_general_dilated(
        y, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.nn.relu(y + b)


def conv_ctx_barrier(x, w, b):
    """Same, but materialize the epilogue before the conv."""
    y = jax.nn.relu(x * 1.03 + 0.11)
    y = jax.lax.optimization_barrier(y)
    y = jax.lax.conv_general_dilated(
        y, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.nn.relu(y + b)


def conv_int8(x, w, b):
    """Static-int8 conv path (per-tensor dyn activations, int8 kernel,
    int32 MXU accumulation) — checks the s8xs8->s32 conv actually runs
    at the 2x MXU rate on v5e."""
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.01), -127, 127
                  ).astype(jnp.int8)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * (sx * 0.01)).astype(jnp.bfloat16)
    return jax.nn.relu(y + b)


FNS = {"conv": conv, "conv_ctx": conv_ctx,
       "conv_ctx_barrier": conv_ctx_barrier,
       "shifts": shifts, "wide": wide, "conv_int8": conv_int8}


def main() -> None:
    iters = 30
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, C, F), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    b = jnp.zeros((F,), jnp.bfloat16)

    runners = {}
    for name, fn in FNS.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(xx, ww, bb, n, fn=fn):
            def body(i, acc):
                xi = xx + (i % 2).astype(jnp.bfloat16) * 1e-3
                return acc + jnp.sum(fn(xi, ww, bb),
                                     dtype=jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def timed(n, run=run):
            t0 = time.perf_counter()
            float(run(x, w, b, n))
            return time.perf_counter() - t0

        timed(1)
        timed(1 + iters)
        runners[name] = timed

    # sanity: same math
    outs = {n: FNS[n](x, w, b) for n in FNS}
    for n in ("shifts", "wide"):
        d = jnp.max(jnp.abs(outs[n].astype(jnp.float32)
                            - outs["conv"].astype(jnp.float32)))
        print(f"# max|{n}-conv| = {float(d):.4f}", flush=True)

    for rep in range(3):
        for name, timed in runners.items():
            t1 = min(timed(1), timed(1))
            tn = min(timed(1 + iters), timed(1 + iters))
            per = (tn - t1) / iters
            print(json.dumps({"rep": rep, "variant": name,
                              "per_call_ms": round(per * 1e3, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
