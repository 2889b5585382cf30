"""Perf sweep on real TPU: attention impl x batch x head path.
Slope-timing (N=1 vs N=1+iters fori_loop on device, scalar fetch)."""
import sys, time, json, functools, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lseg_tpu.config import get_config
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.ops.pallas_correlation import fused_correlate
from lseg_tpu.ops.pallas_upsample_argmax import upsample2x_argmax

key = jax.random.PRNGKey(0)

def time_variant(name, attn_impl, batch, fused_head, iters=8):
    cfg = dataclasses.replace(
        get_config("clip_vitl16_384"),
        vit=dataclasses.replace(
            get_config("clip_vitl16_384").vit, attn_impl=attn_impl),
    )
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    variables = jax.jit(model.init)(key, x1, txt)
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    def fwd(v, xi, t):
        if fused_head:
            emb = model.apply(v, xi, None)
            logits = fused_correlate(emb, t, logit_scale=cfg.logit_scale)
            return upsample2x_argmax(logits)
        return jnp.argmax(model.apply(v, xi, t), axis=-1).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(v, xi, t, n):
        def body(i, acc):
            xj = xi + (i.astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(fwd(v, xj, t), dtype=jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def timed(n):
        t0 = time.perf_counter()
        int(run(variables, x, txt, n))
        return time.perf_counter() - t0

    try:
        timed(1); timed(1 + iters)
        t1 = min(timed(1) for _ in range(2))
        tn = min(timed(1 + iters) for _ in range(2))
        per = (tn - t1) / iters
        print(json.dumps({"variant": name, "img_per_sec": round(batch/per, 2),
                          "per_iter_s": round(per, 4)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "error": str(e)[:300]}), flush=True)

time_variant("xla_b8_full", "xla", 8, False)
time_variant("xla_b32_fused", "xla", 32, True)
time_variant("flash_b32_fused", "flash", 32, True)
time_variant("flash_b64_fused", "flash", 64, True)
