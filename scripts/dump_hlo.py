"""Dump compiled-HLO convolution/dot shapes for a bench variant.

Helps map profiler fusion names to actual op shapes.
Usage: python scripts/dump_hlo.py [--variant=base] [--grep=convolution]
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ab_tpu import VARIANTS  # noqa: E402


def main() -> None:
    variant, pat, batch = "base", "convolution", 8
    for arg in sys.argv[1:]:
        if arg.startswith("--variant="):
            variant = arg.split("=")[1]
        elif arg.startswith("--grep="):
            pat = arg.split("=")[1]
        elif arg.startswith("--batch="):
            batch = int(arg.split("=")[1])

    cfg, model, prep, fwd = VARIANTS[variant]()
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 480, 480, 3), jnp.float32)
    txt = jax.random.normal(key, (150, cfg.out_c), jnp.float32)
    v = jax.jit(model.init)(key, x1, txt)
    v = prep(dict(v))
    x = jax.random.normal(key, (batch, 480, 480, 3), jnp.float32)

    txt_hlo = jax.jit(fwd).lower(v, x, txt).compile().as_text()
    rx = re.compile(pat)
    for line in txt_hlo.splitlines():
        if rx.search(line):
            print(line.strip()[:240])


if __name__ == "__main__":
    main()
