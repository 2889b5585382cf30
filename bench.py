"""Headline benchmark: zero-shot ADE20K-150 single-scale throughput.

Measures images/sec/chip for the flagship LSeg ViT-L/16 forward at
480×480 with the full 150-class text-embedding matrix — the
BASELINE.json north-star config (≥300 img/s/chip on v5e). Text
embeddings are precomputed (cached per label set, as in serving), so the
measured path is exactly the per-image hot loop.

Timing methodology: the forward is iterated ON DEVICE inside one jit'd
`lax.fori_loop` (each iteration's input is perturbed by the loop index
so XLA cannot hoist or CSE the body), and only a scalar checksum leaves
the device. Per-iteration time is the slope between an n=1 and an
n=1+K run, which cancels dispatch/transfer constants — robust even on
relayed TPU backends where `block_until_ready` returns before execution
completes and host↔device transfers are slow. `n` is a TRACED loop
bound so both points share one compiled program.

Robustness under a driver harness with an unknown wall-clock budget
(round-2 lesson: `BENCH_r02.json` rc=124, no number landed):
- a provisional JSON line is printed (and flushed) as soon as the first
  timed pair exists — before activation-scale calibration, which does
  not change the compiled program or its timing, only param values;
- refined lines (more pairs, calibrated scales) REPLACE it; the last
  line printed is the best estimate;
- SIGTERM/SIGALRM/errors re-emit the best-so-far line and exit 0;
- `BENCH_BUDGET_S` env (or --budget=N) arms a self-deadline.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"}; the LAST
line is the result. vs_baseline = value / 300 (north-star; the
reference publishes no throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

NORTH_STAR = 300.0  # img/s/chip on v5e (BASELINE.json)

_best_line: str | None = None


def _emit(img_per_sec: float) -> None:
    """Print a result line now; later emissions supersede earlier ones."""
    global _best_line
    _best_line = json.dumps({
        "metric": "img_per_sec_chip_480x480_ade20k150_zeroshot",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / NORTH_STAR, 3),
    })
    print(_best_line, flush=True)


def _bail(signum, frame):  # re-emit best and stop cleanly
    if _best_line is not None:
        print(_best_line, flush=True)
        sys.exit(0)
    sys.exit(1)


_CACHE_DIR = "/tmp/lseg_tpu_jax_cache_tpu"


def _warm_cache_subprocess(batch: int) -> None:
    """Cold-cache protection (round-2 lesson, VERDICT item 1a): the
    remote compile helper can die when several big programs compile in
    one session, killing the whole bench. On a cold cache, compile the
    full program set in SUBPROCESSES first (--compile-only mode) —
    every program that lands persists in the cache, so the main
    process (and a retry) is served from cache even if a subprocess
    dies mid-way."""
    import subprocess

    try:
        warm = os.path.isdir(_CACHE_DIR) and len(os.listdir(_CACHE_DIR))
    except OSError:
        warm = False
    if warm:
        return
    for _ in range(2):
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__),
             "--compile-only", f"--batch={batch}"],
            timeout=None, stdout=sys.stderr, stderr=sys.stderr,
        )
        if rc == 0:
            return


def main() -> None:
    batch = 8
    iters = 12
    budget = float(os.environ.get("BENCH_BUDGET_S", "0"))
    compile_only = "--compile-only" in sys.argv
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        if arg.startswith("--iters="):
            iters = int(arg.split("=")[1])
        if arg.startswith("--budget="):
            budget = float(arg.split("=")[1])

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGINT, _bail)
    if budget > 0 and not compile_only:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(max(int(budget) - 5, 1))
    if not compile_only:
        _warm_cache_subprocess(batch)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/lseg_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lseg_tpu.config import fast_serving, get_config
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import calibrate_act_scales, quantize_tree

    # The documented fast-serving configuration (flat-layout flash
    # attention + fused qkv kernel + tanh GELU + bf16 deferred-norm
    # fused head + static int8 projections/decoder convs with
    # calibrated activation scales) — drift bounds and trained-model
    # mIoU-delta tests in tests/test_quant.py; evaluate.py defaults to
    # the parity config and opts in via --fast [--int8].
    cfg = fast_serving(get_config("clip_vitl16_384"), quant="static_cal")
    model = LSegNet(cfg, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    variables = jax.jit(model.init)(key, x1, txt)
    # load-time weight quantization: int8 kernels + per-channel scales
    # live in the serving tree (ops/quant.quantize_tree; decoder=True
    # also pre-quantizes the decoder/head1 conv kernels). Activation
    # scales start at init values; calibration below refines them and
    # does NOT change the compiled program, so throughput timing is
    # valid either way.
    variables = dict(variables)
    variables["params"] = quantize_tree(variables["params"], decoder=True,
                                        act_scale=True)
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    @jax.jit
    def run(v, x, t, n):
        def body(i, acc):
            xi = x + (i.astype(jnp.float32) * 1e-6)
            # half-res-argmax serving mode: argmax over K inside the
            # fused head kernel + nearest x2 of the label map (239.8
            # vs 230.2 img/s interleaved r4; boundary-only deviation
            # from bilinear-then-argmax, mIoU-delta gated on a trained
            # model in tests/test_quant.py)
            pred = model.apply(v, xi, t, return_argmax=True)
            return acc + jnp.sum(pred, dtype=jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0),
                                 unroll=False)

    if compile_only:
        # compile the full program set into the persistent cache, then
        # exit — run as a subprocess by _warm_cache_subprocess
        jax.block_until_ready(
            run.lower(variables, x, txt, jnp.int32(1)).compile()(
                variables, x, txt, jnp.int32(1)))
        variables = calibrate_act_scales(model, variables, x, None)
        print("compile-only: done", file=sys.stderr, flush=True)
        return

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        val = int(run(variables, x, txt, jnp.int32(n)))  # scalar fetch
        dt = time.perf_counter() - t0
        assert val != -1
        return dt

    def measure(pairs: int) -> float:
        # the relay shows seconds-scale dispatch jitter; retry until
        # the slope is sane (positive, plausible img/s) so a single
        # slow round-trip can never become the emitted number
        for _ in range(4):
            t1 = min(timed(1) for _ in range(pairs))
            tn = min(timed(1 + iters) for _ in range(pairs))
            if tn > t1:
                v = batch * iters / (tn - t1)
                if 1.0 <= v <= 10000.0:
                    return v
            pairs = min(pairs + 1, 3)
        raise RuntimeError("no sane slope after retries")

    try:
        timed(1)  # compile (one program serves every n)
        _emit(measure(1))  # provisional: first slope, uncalibrated

        # static PTQ activation-scale calibration (one jitted forward;
        # same program structure → throughput unchanged, numerics real)
        variables = calibrate_act_scales(model, variables, x, None)
        _emit(measure(2))
    except Exception:
        if _best_line is not None:
            print(_best_line, flush=True)
            return
        raise


if __name__ == "__main__":
    main()
