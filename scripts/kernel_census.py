"""Compile-census of every ADOPTED Pallas kernel on the current TPU
toolchain, each in a fresh subprocess (the axon compile helper can die
on cumulative load, and a fresh process isolates failures).

Run this at round start / after any toolchain drift suspicion: the
round-4 driver bench died because the relay's Mosaic compiler changed
between days and started rejecting a construct that had compiled for
two rounds (lane-offset slices of one-row blocks feeding broadcasts —
see scripts/mosaic_probe.py and BENCH_r04.json). A kernel regression
should be caught the day it happens, not at the driver deadline.

Usage:
  python scripts/kernel_census.py            # all adopted kernels
  python scripts/kernel_census.py flashlnq_q8 headt   # subset
  python scripts/kernel_census.py --child <name>      # internal

Exit code = number of failing kernels.
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# name -> python source that builds + compiles the kernel at the
# flagship serving shape (batch 8, T=904 valid 901, D=1024, 16 heads
# — hard-coded in each case; lower+compile only: no execution, so
# each child is one remote compile).
CASES = {
    "flashflat": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import flash_attention_flat
qkv = jnp.zeros((8, 904, 3072), jnp.bfloat16)
jax.jit(lambda q: flash_attention_flat(
    q, 16, 0.125, block_q=1024, valid_len=901)).lower(qkv).compile()
""",
    "flashq": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import flash_attention_qkv_fused
xq = jnp.zeros((8, 904, 1024), jnp.int8)
sx = jnp.zeros((8, 904, 1), jnp.float32)
w = jnp.zeros((1024, 3072), jnp.int8)
sw = jnp.zeros((3072,), jnp.float32)
b = jnp.zeros((3072,), jnp.float32)
jax.jit(lambda *a: flash_attention_qkv_fused(
    *a, 16, 0.125, valid_len=901)).lower(xq, sx, w, sw, b).compile()
""",
    "flashlnq": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import flash_attention_ln_qkv_fused
x = jnp.zeros((8, 904, 1024), jnp.bfloat16)
g = jnp.zeros((1024,), jnp.float32)
bl = jnp.zeros((1024,), jnp.float32)
w = jnp.zeros((1024, 3072), jnp.int8)
sw = jnp.zeros((3072,), jnp.float32)
b = jnp.zeros((3072,), jnp.float32)
jax.jit(lambda *a: flash_attention_ln_qkv_fused(
    *a, 16, 0.125, valid_len=901)).lower(x, g, bl, w, sw, b).compile()
""",
    "flashlnq_q8": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import (
    flash_attention_ln_qkv_fused_q8)
x = jnp.zeros((8, 904, 1024), jnp.bfloat16)
g = jnp.zeros((1024,), jnp.float32)
bl = jnp.zeros((1024,), jnp.float32)
w = jnp.zeros((1024, 3072), jnp.int8)
sw = jnp.zeros((3072,), jnp.float32)
b = jnp.zeros((3072,), jnp.float32)
jax.jit(lambda *a: flash_attention_ln_qkv_fused_q8(
    *a, 16, 0.125, valid_len=901)).lower(x, g, bl, w, sw, b).compile()
""",
    # the adopted fast-serving form since round 5: two head-pairs per
    # grid step (fast_serving sets attn_variant='quad')
    "flashlnq_q8_quad": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import (
    flash_attention_ln_qkv_fused_q8)
x = jnp.zeros((8, 904, 1024), jnp.bfloat16)
g = jnp.zeros((1024,), jnp.float32)
bl = jnp.zeros((1024,), jnp.float32)
w = jnp.zeros((1024, 3072), jnp.int8)
sw = jnp.zeros((3072,), jnp.float32)
b = jnp.zeros((3072,), jnp.float32)
jax.jit(lambda *a: flash_attention_ln_qkv_fused_q8(
    *a, 16, 0.125, valid_len=901, quad=True,
)).lower(x, g, bl, w, sw, b).compile()
""",
    "lnf": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_ln import ln_quantize_rows
x = jnp.zeros((8, 904, 1024), jnp.bfloat16)
g = jnp.zeros((1024,), jnp.float32)
b = jnp.zeros((1024,), jnp.float32)
jax.jit(lambda *a: ln_quantize_rows(*a)).lower(x, g, b).compile()
""",
    "headt": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_correlation import (
    head1_correlate_argmax_fused_t)
x = jnp.zeros((8, 120, 120, 256), jnp.bfloat16)
sx = jnp.float32(1.0)
w1q = jnp.zeros((1, 1, 256, 512), jnp.int8)
s1 = jnp.zeros((512,), jnp.float32)
b1 = jnp.zeros((512,), jnp.float32)
txt = jnp.zeros((150, 512), jnp.float32)
jax.jit(lambda *a: head1_correlate_argmax_fused_t(
    *a)).lower(x, sx, w1q, s1, b1, txt).compile()
""",
    "headf": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_correlation import head1_correlate_fused
x = jnp.zeros((8, 240, 240, 256), jnp.int8)
sx = jnp.float32(1.0)
w1q = jnp.zeros((1, 1, 256, 512), jnp.int8)
s1 = jnp.zeros((512,), jnp.float32)
b1 = jnp.zeros((512,), jnp.float32)
txt = jnp.zeros((150, 512), jnp.float32)
jax.jit(lambda *a: head1_correlate_fused(
    *a, logit_scale=14.285714, normalize=False,
)).lower(x, sx, w1q, s1, b1, txt).compile()
""",
    "patchf": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_patch import patch_embed_fused
x = jnp.zeros((8, 480, 480, 3), jnp.bfloat16)
w = jnp.zeros((16, 16, 3, 1024), jnp.float32)
b = jnp.zeros((1024,), jnp.float32)
jax.jit(lambda *a: patch_embed_fused(
    *a, 16, 1024)).lower(x, w, b).compile()
""",
    "flash_vjp": """
import jax, jax.numpy as jnp
from lseg_tpu.ops.pallas_attention import flash_attention_flat_vjp
qkv = jnp.zeros((2, 904, 3072), jnp.bfloat16)
def loss(q):
    return flash_attention_flat_vjp(
        q, 16, 0.125, 1024, None, 901).astype(jnp.float32).sum()
jax.jit(jax.grad(loss)).lower(qkv).compile()
""",
}


def run_child(name):
    import jax  # noqa: F401  (fail fast if backend is broken)
    src = CASES[name]
    exec(compile(src, f"<census:{name}>", "exec"), {})
    print(f"CENSUS {name}: OK")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--child" in sys.argv:
        run_child(args[0])
        return
    names = args or list(CASES)
    fails = []
    for name in names:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child", name],
                capture_output=True, text=True, timeout=900)
            ok = f"CENSUS {name}: OK" in r.stdout
            tail = (r.stderr or r.stdout).strip().splitlines()
        except subprocess.TimeoutExpired as e:
            # a HUNG remote compile is a census failure for that
            # kernel, not a reason to abort the remaining kernels
            ok = False
            tail = [f"timeout after {e.timeout:.0f}s "
                    "(remote compile hung)"]
        print(f"{name}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            fails.append(name)
            for line in tail[-8:]:
                print(f"    {line}")
    print(f"census: {len(names) - len(fails)}/{len(names)} OK"
          + (f"  FAILING: {','.join(fails)}" if fails else ""))
    sys.exit(len(fails))


if __name__ == "__main__":
    main()
