"""Interleaved A/B on TPU: fused head+upsample+argmax kernel vs the
current head1_correlate_fused + XLA upsample/argmax tail."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lseg_tpu.ops.pallas_correlation import (
    head1_correlate_fused, head1_correlate_upsample_argmax)
from lseg_tpu.ops.resize import upsample2x

n, h, w, c, e, k = 8, 240, 240, 256, 512, 150
rows = 8
for a in sys.argv[1:]:
    if a.startswith("--rows="):
        rows = int(a.split("=")[1])
rng = np.random.RandomState(0)
xq = jnp.asarray(rng.randint(-127, 128, (n, h, w, c)), jnp.int8)
sx = jnp.float32(0.02)
w1q = jnp.asarray(rng.randint(-127, 128, (1, 1, c, e)), jnp.int8)
s1 = jnp.asarray(rng.rand(e).astype(np.float32) * 0.01 + 1e-3)
b1 = jnp.asarray(rng.randn(e).astype(np.float32) * 0.1)
txt = jnp.asarray(rng.randn(k, e).astype(np.float32))

@jax.jit
def tail_a(xq, txt, m):
    def body(i, acc):
        xi = (xq.astype(jnp.int32) + i % 3 - 1).astype(jnp.int8)
        half = head1_correlate_fused(xi, sx, w1q, s1, b1, txt)
        pred = jnp.argmax(upsample2x(half, align_corners=True,
                                     compute_dtype=jnp.bfloat16), axis=-1)
        return acc + jnp.sum(pred, dtype=jnp.int32)
    return jax.lax.fori_loop(0, m, body, jnp.int32(0))

@jax.jit
def tail_b(xq, txt, m):
    def body(i, acc):
        xi = (xq.astype(jnp.int32) + i % 3 - 1).astype(jnp.int8)
        pred = head1_correlate_upsample_argmax(
            xi, sx, w1q, s1, b1, txt, rows=rows)
        return acc + jnp.sum(pred, dtype=jnp.int32)
    return jax.lax.fori_loop(0, m, body, jnp.int32(0))

# correctness on device
pa = np.asarray(jnp.argmax(upsample2x(
    head1_correlate_fused(xq, sx, w1q, s1, b1, txt),
    align_corners=True, compute_dtype=jnp.bfloat16), axis=-1))
pb = np.asarray(head1_correlate_upsample_argmax(
    xq, sx, w1q, s1, b1, txt, rows=rows))
print("agreement:", (pa == pb).mean(), flush=True)

iters = 50
for r in (tail_a, tail_b):
    int(r(xq, txt, jnp.int32(1))); int(r(xq, txt, jnp.int32(1 + iters)))
for rep in range(3):
    out = []
    for name, r in (("A_xla_tail", tail_a), ("B_fused", tail_b)):
        t0 = time.perf_counter(); int(r(xq, txt, jnp.int32(1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); int(r(xq, txt, jnp.int32(1 + iters)))
        tn = time.perf_counter() - t0
        out.append(f"{name} {(tn - t1) / iters * 1e3:.3f} ms")
    print(" | ".join(out), flush=True)
