"""Headline benchmark: zero-shot ADE20K-150 single-scale throughput.

Measures images/sec/chip for the flagship LSeg ViT-L/16 forward at
480×480 with the full 150-class text-embedding matrix — the
BASELINE.json north-star config (≥300 img/s/chip on v5e). Text
embeddings are precomputed (cached per label set, as in serving), so the
measured path is exactly the per-image hot loop.

Timing methodology: the forward is iterated ON DEVICE inside one jit'd
`lax.fori_loop` (each iteration's input is perturbed by the loop index
so XLA cannot hoist or CSE the body), and only a scalar checksum leaves
the device. Per-iteration time is the slope between an N=1 and an N=1+K
run, which cancels dispatch/transfer constants — robust even on relayed
TPU backends where `block_until_ready` returns before execution
completes and host↔device transfers are slow.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 300 (north-star; the reference publishes no
throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

NORTH_STAR = 300.0  # img/s/chip on v5e (BASELINE.json)


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/lseg_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lseg_tpu.config import fast_serving, get_config
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import calibrate_act_scales, quantize_tree

    # The documented fast-serving configuration (flat-layout flash
    # attention + tanh GELU + bf16 deferred-norm head + static int8
    # projections + int8 decoder convs with calibrated activation
    # scales) — model-level drift bounds and argmax-agreement tests in
    # tests/test_quant.py; evaluate.py defaults to the parity config
    # and opts in via --fast [--int8].
    cfg = fast_serving(get_config("clip_vitl16_384"), quant="static_cal")
    model = LSegNet(cfg, dtype=jnp.bfloat16)

    batch = 8
    iters = 12
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        if arg.startswith("--iters="):
            iters = int(arg.split("=")[1])

    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    variables = jax.jit(model.init)(key, x1, txt)
    # load-time weight quantization: int8 kernels + per-channel scales
    # live in the serving tree (ops/quant.quantize_tree; decoder=True
    # also pre-quantizes the decoder/head1 conv kernels), followed by
    # one activation-scale calibration forward (static PTQ)
    variables = dict(variables)
    variables["params"] = quantize_tree(variables["params"], decoder=True,
                                        act_scale=True)
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)
    variables = calibrate_act_scales(model, variables, x, None)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(v, x, t, n):
        def body(i, acc):
            xi = x + (i.astype(jnp.float32) * 1e-6)
            pred = jnp.argmax(model.apply(v, xi, t), axis=-1)
            return acc + jnp.sum(pred, dtype=jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        val = int(run(variables, x, txt, n))  # scalar fetch forces exec
        dt = time.perf_counter() - t0
        assert val != -1
        return dt

    # compile both program variants, then measure the slope
    timed(1)
    timed(1 + iters)
    t1 = min(timed(1) for _ in range(2))
    tn = min(timed(1 + iters) for _ in range(2))
    per_iter = (tn - t1) / iters
    img_per_sec = batch / per_iter

    print(json.dumps({
        "metric": "img_per_sec_chip_480x480_ade20k150_zeroshot",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
