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

Compile-failure robustness (round-4 lesson: `BENCH_r04.json` rc=1 with
zero information after the relay's Mosaic compiler drifted and started
rejecting the adopted attention kernels): without --config, this
process is an ORCHESTRATOR that walks a config fallback ladder — full
fast stack → flashq → flashflat+int8 → bf16 no-quant kernels → pure
XLA — running each rung as a subprocess and stopping at the first that
prints a result line. A kernel regression degrades the measured config
(the JSON line carries its name) instead of zeroing the round. Run
scripts/kernel_census.py to localize which kernel broke.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", "config"};
the LAST line is the result. vs_baseline = value / 300 (north-star; the
reference publishes no throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

NORTH_STAR = 300.0  # img/s/chip on v5e (BASELINE.json)

# Fallback ladder, fastest first. Each rung removes the kernel family
# most likely to have broken in the rung above it; the last rung is
# pure XLA (no Pallas at all) and compiles on any toolchain.
LADDER = ("fast_cal", "fast_cal_pair", "fast_flashq", "fast_flashflat",
          "fast_bf16", "xla_bf16")

_best_line: str | None = None
_config_name: str = "fast_cal"


def _emit(img_per_sec: float) -> None:
    """Print a result line now; later emissions supersede earlier ones."""
    global _best_line
    _best_line = json.dumps({
        "metric": "img_per_sec_chip_480x480_ade20k150_zeroshot",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / NORTH_STAR, 3),
        "config": _config_name,
    })
    print(_best_line, flush=True)


def _bail(signum, frame):  # re-emit best and stop cleanly
    if _best_line is not None:
        print(_best_line, flush=True)
        sys.exit(0)
    sys.exit(1)


_CACHE_DIR = "/tmp/lseg_tpu_jax_cache_tpu"


def _build_cfg(name: str):
    """Ladder rung -> (LSegConfig, quant mode for the param tree)."""
    import dataclasses

    from lseg_tpu.config import fast_serving, get_config

    base = get_config("clip_vitl16_384")
    if name == "fast_cal":
        # The documented fast-serving configuration (LN+qkv+flash fused
        # kernel with q8 output, LN2+quantize pass, fused lowres argmax
        # head, patchify kernel, tanh GELU, static int8 projections +
        # decoder convs with calibrated activation scales) — drift
        # bounds and trained-model mIoU-delta tests in
        # tests/test_quant.py; evaluate.py defaults to the parity
        # config and opts in via --fast [--int8].
        return fast_serving(base, quant="static_cal"), "static_cal"
    if name == "fast_cal_pair":
        # fast_cal with the pair-per-step flashlnq grid (the pre-r5
        # default) — one rung below the quad grid variant
        cfg = fast_serving(base, quant="static_cal")
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(
            cfg.vit, attn_variant="v1"))
        return cfg, "static_cal"
    if name == "fast_flashq":
        # no LN-fused kernels: external LN + flash_attention_qkv_fused
        cfg = fast_serving(base, quant="static_cal")
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(
            cfg.vit, attn_impl="flashq", ln_quant_fused=False,
            mlp_act_cal=False))
        return cfg, "static_cal"
    if name == "fast_flashflat":
        # XLA int8 qkv/proj matmuls + the plain flat flash kernel
        cfg = fast_serving(base, quant="static")
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(
            cfg.vit, attn_impl="flashflat", ln_quant_fused=False,
            mlp_act_cal=False))
        return cfg, "static"
    if name == "fast_bf16":
        # no quantization: flashflat + patchify kernels only, XLA head
        return fast_serving(base, quant=False), False
    if name == "xla_bf16":
        # zero Pallas kernels — bf16-scores XLA attention everywhere
        cfg = fast_serving(base, quant=False)
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(
            cfg.vit, attn_impl="xla", patch_fused=False))
        return cfg, False
    raise ValueError(f"unknown bench config {name!r}")


def _warm_cache_subprocess(batch: int, cfg_name: str) -> None:
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
             "--compile-only", f"--batch={batch}",
             f"--config={cfg_name}"],
            timeout=None, stdout=sys.stderr, stderr=sys.stderr,
        )
        if rc == 0:
            return


# Per-rung wall cap when NO driver budget is armed: a remote compile
# that HANGS (rather than erroring) must not block the ladder forever
# — the child's own SIGALRM cannot fire while it is stuck inside a
# blocking C compile call, so the parent enforces the cap and moves
# to the next rung. Cold flagship compiles run up to ~10 min; 25 min
# is comfortably above any healthy rung. Env override exists for
# watchdog testing only (pair with LSEG_BENCH_FAULT_MODE=hang).
RUNG_TIMEOUT_S = float(os.environ.get("LSEG_BENCH_RUNG_TIMEOUT_S",
                                      "1500"))


def _ladder_main(passthrough: list[str], budget: float) -> None:
    """Orchestrator: run each ladder rung as a subprocess, streaming
    its stdout through; stop at the first rung that prints a result
    JSON line. Exit 0 iff some rung delivered a number."""
    import selectors
    import subprocess

    deadline = time.monotonic() + budget if budget > 0 else None
    child: subprocess.Popen | None = None
    stopping = []

    def fwd(signum, frame):
        stopping.append(signum)
        if child is not None and child.poll() is None:
            child.send_signal(signal.SIGTERM)  # child emits best line

    signal.signal(signal.SIGTERM, fwd)
    signal.signal(signal.SIGINT, fwd)

    for rung in LADDER:
        args = [sys.executable, os.path.abspath(__file__),
                f"--config={rung}", *passthrough]
        rung_cap = RUNG_TIMEOUT_S
        if deadline is not None:
            left = deadline - time.monotonic()
            if left < 30:
                break
            args.append(f"--budget={left:.0f}")
            rung_cap = left + 60  # child bails first in the sane case
        child = subprocess.Popen(args, stdout=subprocess.PIPE,
                                 text=True)
        rung_deadline = time.monotonic() + rung_cap
        got_json = False
        hung = False
        sel = selectors.DefaultSelector()
        sel.register(child.stdout, selectors.EVENT_READ)
        while True:
            if child.poll() is not None:
                break
            if time.monotonic() > rung_deadline:
                hung = True
                child.send_signal(signal.SIGTERM)
                try:
                    child.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    child.kill()
                break
            if not sel.select(timeout=5):
                continue
            line = child.stdout.readline()
            if not line:
                break
            print(line, end="", flush=True)
            if line.startswith("{"):
                got_json = True
        sel.unregister(child.stdout)
        # drain whatever the (possibly SIGTERM'd) child still wrote
        for line in (child.stdout.read() or "").splitlines(True):
            print(line, end="", flush=True)
            if line.startswith("{"):
                got_json = True
        rc = child.wait()
        if got_json:
            sys.exit(0)
        if stopping:  # driver asked us to wrap up — no new rungs
            sys.exit(1)
        why = "hung past the rung cap" if hung else f"rc={rc}"
        print(f"bench: config '{rung}' produced no result ({why}); "
              "falling back", file=sys.stderr, flush=True)
    sys.exit(1)


def main() -> None:
    batch = 8
    iters = 12
    budget = float(os.environ.get("BENCH_BUDGET_S", "0"))
    compile_only = "--compile-only" in sys.argv
    cfg_name = None
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        if arg.startswith("--iters="):
            iters = int(arg.split("=")[1])
        if arg.startswith("--budget="):
            budget = float(arg.split("=")[1])
        if arg.startswith("--config="):
            cfg_name = arg.split("=")[1]

    if cfg_name is None and not compile_only:
        passthrough = [a for a in sys.argv[1:]
                       if not a.startswith("--budget=")]
        _ladder_main(passthrough, budget)
        return
    if cfg_name is None:
        cfg_name = LADDER[0]
    global _config_name
    _config_name = cfg_name

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGINT, _bail)
    if budget > 0 and not compile_only:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(max(int(budget) - 5, 1))
    if not compile_only:
        _warm_cache_subprocess(batch, cfg_name)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/lseg_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.quant import calibrate_act_scales, quantize_tree

    fault = os.environ.get("LSEG_BENCH_FAULT")
    if fault:
        # Fault injection for ladder testing: disable one adopted
        # kernel by module-attribute name (the model imports kernels at
        # call time, so rebinding the module attr breaks exactly that
        # path). E.g. LSEG_BENCH_FAULT=flash_attention_ln_qkv_fused_q8
        # python bench.py -> the ladder must still print a JSON line.
        # LSEG_BENCH_FAULT_MODE=hang simulates a compile that HANGS
        # instead of erroring (sleep forever inside the kernel call) —
        # exercises the orchestrator's per-rung watchdog/kill path;
        # pair with LSEG_BENCH_RUNG_TIMEOUT_S to keep the test short.
        import lseg_tpu.ops.pallas_attention as _pa
        import lseg_tpu.ops.pallas_correlation as _pc
        import lseg_tpu.ops.pallas_ln as _pln
        import lseg_tpu.ops.pallas_patch as _pp

        if os.environ.get("LSEG_BENCH_FAULT_MODE") == "hang":
            def _boom(*a, **k):
                while True:  # a stuck remote compile never returns
                    time.sleep(3600)
        else:
            def _boom(*a, **k):
                raise RuntimeError(
                    f"LSEG_BENCH_FAULT: {fault} disabled")

        hit = False
        for m in (_pa, _pc, _pln, _pp):
            if hasattr(m, fault):
                setattr(m, fault, _boom)
                hit = True
        if not hit:
            raise ValueError(f"LSEG_BENCH_FAULT names no kernel: "
                             f"{fault!r}")

    cfg, quant = _build_cfg(cfg_name)
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
    if quant:
        variables = dict(variables)
        variables["params"] = quantize_tree(
            variables["params"], decoder=True,
            act_scale=(quant == "static_cal"),
            mlp_act_scale=bool(cfg.vit.mlp_act_cal))
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
        if quant == "static_cal":
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
        if quant == "static_cal":
            variables = calibrate_act_scales(model, variables, x, None)
        _emit(measure(2))
    except Exception:
        if _best_line is not None:
            print(_best_line, flush=True)
            return
        raise


if __name__ == "__main__":
    main()
