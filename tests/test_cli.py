"""CLI surfaces parse and import cleanly (the reference exposes
train_lseg.py / test_lseg.py / test_lseg_zs.py / lseg_app.py; ours:
train.py / evaluate.py / test_zs.py / demo.py / hsnet_run.py /
prepare_ade20k.py / bench.py)."""

import subprocess
import sys

import pytest

CLIS = [
    "train.py",
    "evaluate.py",
    "test_zs.py",
    "demo.py",
    "hsnet_run.py",
    "prepare_ade20k.py",
    "parity_check.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    out = subprocess.run(
        [sys.executable, f"/root/repo/{cli}", "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()


def test_bench_importable():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import only; main() not called
    assert hasattr(mod, "main")
