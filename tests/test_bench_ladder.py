"""bench.py fallback-ladder config construction (pure CPU).

The ladder's whole point is robustness: every rung must BUILD even
when the toolchain has broken a kernel, and each rung must actually
remove the kernel family the rung above it depends on. A rename or
config-field drift that breaks `_build_cfg` would otherwise only
surface during a real TPU bench run (or worse, the driver's)."""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_ladder_rung_builds_and_degrades():
    bench = _load_bench()
    cfgs = {}
    for rung in bench.LADDER:
        cfg, quant = bench._build_cfg(rung)
        cfgs[rung] = (cfg, quant)

    # distinct configs per rung (a duplicate rung wastes a fallback)
    reprs = [repr(c) for c, _ in cfgs.values()]
    assert len(set(reprs)) == len(reprs)

    # rung 0 is the adopted fast config: quad grid + LN-fused kernel
    cfg0, quant0 = cfgs[bench.LADDER[0]]
    assert cfg0.vit.attn_impl == "flashlnq"
    assert cfg0.vit.attn_variant == "quad"
    assert quant0 == "static_cal"

    # each named degradation removes what it claims to remove
    cfg_pair, _ = cfgs["fast_cal_pair"]
    assert cfg_pair.vit.attn_variant == "v1"
    cfg_q, _ = cfgs["fast_flashq"]
    assert cfg_q.vit.attn_impl == "flashq"
    assert not cfg_q.vit.ln_quant_fused and not cfg_q.vit.mlp_act_cal
    cfg_ff, quant_ff = cfgs["fast_flashflat"]
    assert cfg_ff.vit.attn_impl == "flashflat"
    cfg_bf, quant_bf = cfgs["fast_bf16"]
    assert quant_bf is False
    cfg_x, quant_x = cfgs["xla_bf16"]
    # the last rung must be Pallas-free
    assert cfg_x.vit.attn_impl == "xla"
    assert not cfg_x.vit.patch_fused
    assert quant_x is False


def test_census_cases_are_valid_python():
    """Every kernel_census case must at least parse — a syntax error
    in a case string would otherwise report FAIL on a healthy
    toolchain and mask real drift."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import kernel_census
    finally:
        sys.path.pop(0)
    for name, src in kernel_census.CASES.items():
        compile(src, f"<census:{name}>", "exec")
    # the adopted serving kernels are all covered
    for required in ("flashlnq_q8", "flashlnq_q8_quad", "lnf", "headt",
                     "patchf", "flash_vjp"):
        assert required in kernel_census.CASES, required


@pytest.mark.slow
def test_ladder_orchestrator_never_hangs_without_tpu():
    """End-to-end orchestrator smoke WITHOUT a TPU: on this host every
    rung's child stalls in a flagship XLA:CPU compile (minutes each),
    so the parent-side per-rung watchdog is what keeps the ladder
    moving — it must kill each rung at the cap, print the
    falling-back diagnostic, and exit 1 cleanly: never hang, never
    traceback."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               LSEG_BENCH_RUNG_TIMEOUT_S="20",
               LSEG_BENCH_FAULT="flash_attention_ln_qkv_fused_q8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--iters=1"],
        capture_output=True, text=True, timeout=360, env=env)
    assert r.returncode != 0
    assert r.stderr.count("falling back") >= 1, r.stderr[-2000:]
