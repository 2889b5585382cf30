"""Flagship multi-scale TTA wall-time on the real TPU: device-built
pyramid vs host-uploaded pyramid (the round-1 path measured at
6.5-8 s/image, transfer-dominated). Interleaved per-image timing.

Usage: python scripts/tta_bench.py [--images=3] [--size=512x683]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lseg_tpu.config import fast_serving, get_config
from lseg_tpu.engine.serve import make_logits_fn
from lseg_tpu.engine.tta import ADE20K_PROTOCOL, MultiScaleEvaluator
from lseg_tpu.models.lseg import LSegNet


def main() -> None:
    n_images, h, w = 3, 512, 683
    for arg in sys.argv[1:]:
        if arg.startswith("--images="):
            n_images = int(arg.split("=")[1])
        elif arg.startswith("--size="):
            h, w = map(int, arg.split("=")[1].split("x"))

    int8 = "--int8" in sys.argv
    cfg = fast_serving(get_config("clip_vitl16_384"),
                       quant="static_cal" if int8 else False)
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    variables = jax.jit(model.init)(
        key, jnp.zeros((1, 480, 480, 3), jnp.float32), txt)
    if int8:
        from lseg_tpu.ops.quant import (calibrate_act_scales,
                                        quantize_tree)
        variables = dict(variables)
        variables["params"] = quantize_tree(
            variables["params"], decoder=True, act_scale=True)
        variables = calibrate_act_scales(
            model, variables,
            jax.random.normal(key, (8, 480, 480, 3), jnp.float32), None)
    apply_fn = make_logits_fn(model, variables)

    evs = {
        "device_pyr": MultiScaleEvaluator(
            apply_fn, 150, ADE20K_PROTOCOL, device_pyramid=True),
        "host_pyr": MultiScaleEvaluator(
            apply_fn, 150, ADE20K_PROTOCOL, device_pyramid=False),
    }
    rng = np.random.RandomState(0)
    img = rng.randn(h, w, 3).astype(np.float32)

    # warm both (compiles + first transfers)
    for name, ev in evs.items():
        t0 = time.perf_counter()
        ev(img, txt)
        print(f"# {name} warm-up {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {k: [] for k in evs}
    for i in range(n_images):
        img_i = rng.randn(h, w, 3).astype(np.float32)
        for name, ev in evs.items():
            t0 = time.perf_counter()
            out = ev(img_i, txt)
            dt = time.perf_counter() - t0
            assert out.shape == (h, w)
            times[name].append(dt)
            print(f"img {i} {name}: {dt:.2f}s", flush=True)
    for name, ts in times.items():
        print(f"# {name}: best {min(ts):.2f}s median "
              f"{sorted(ts)[len(ts) // 2]:.2f}s", flush=True)


if __name__ == "__main__":
    main()
