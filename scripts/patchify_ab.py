"""Interleaved A/B: patchify transpose+matmul vs direct 6D einsum."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, h, w, c, p, d = 8, 480, 480, 3, 16, 1024
gh, gw = h // p, w // p
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (n, h, w, c), jnp.float32)
k = jax.random.normal(key, (p, p, c, d), jnp.float32)

def variant_a(x, k):
    xp = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(n, gh * gw, p * p * c).astype(jnp.bfloat16)
    return jnp.dot(xp, k.reshape(p * p * c, d).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

def variant_b(x, k):
    x6 = x.reshape(n, gh, p, gw, p, c).astype(jnp.bfloat16)
    y = jnp.einsum("nhpwqc,pqcd->nhwd", x6, k.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return y.reshape(n, gh * gw, d)

def loop(fn):
    @jax.jit
    def run(x, k, m):
        def body(i, acc):
            xi = x + i.astype(jnp.float32) * 1e-6
            return acc + jnp.sum(fn(xi, k), dtype=jnp.float32)
        return jax.lax.fori_loop(0, m, body, jnp.float32(0))
    return run

ra, rb = loop(variant_a), loop(variant_b)
# numerical check
import numpy as np
np.testing.assert_allclose(np.asarray(variant_a(x, k)),
                           np.asarray(variant_b(x, k)), rtol=1e-2, atol=1e-2)
iters = 100
for r in (ra, rb):
    float(r(x, k, jnp.int32(1))); float(r(x, k, jnp.int32(1 + iters)))
for rep in range(3):
    out = []
    for name, r in (("A_transpose", ra), ("B_einsum", rb)):
        t0 = time.perf_counter(); float(r(x, k, jnp.int32(1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r(x, k, jnp.int32(1 + iters)))
        tn = time.perf_counter() - t0
        out.append(f"{name} {(tn - t1) / iters * 1e3:.3f} ms")
    print(" | ".join(out), flush=True)
