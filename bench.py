"""Headline benchmark: zero-shot ADE20K-150 single-scale throughput.

Measures images/sec/chip for the flagship LSeg ViT-L/16 forward at
480×480 with the full 150-class text-embedding matrix — the
BASELINE.json north-star config (≥300 img/s/chip on v5e). The text
embeddings are precomputed (cached per label set, as in serving), so the
measured path is exactly the per-image hot loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 300 (the north-star target; the reference
publishes no throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

NORTH_STAR = 300.0  # img/s/chip on v5e (BASELINE.json)


def main() -> None:
    from lseg_tpu.config import get_config
    from lseg_tpu.models.lseg import LSegNet

    cfg = get_config("clip_vitl16_384")
    model = LSegNet(cfg, dtype=jnp.bfloat16)

    batch = 8
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])

    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    variables = jax.jit(model.init)(key, x1, txt)

    @jax.jit
    def forward(variables, x, txt):
        # Serving returns the argmax label map; keeping it on device
        # avoids the (N,480,480,150) fp32 logit transfer.
        logits = model.apply(variables, x, txt)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)
    # Compile + warmup.
    forward(variables, x, txt).block_until_ready()
    for _ in range(3):
        forward(variables, x, txt).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, x, txt)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "img_per_sec_chip_480x480_ade20k150_zeroshot",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
