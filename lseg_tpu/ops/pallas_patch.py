"""Fused patchify + patch-embedding matmul as a Pallas TPU kernel.

The stride-p patch embedding (reference: timm PatchEmbed consumed via
modules/models/lseg_vit.py:177-183) is a relayout + matmul. XLA's
patchify relayout is lane-hostile (c=3 minor dim) and costs ~0.45 ms at
the flagship shape against a ~0.1 ms roofline (r4 profile: copy.69 +
two reshapes + the matmul). Mosaic cannot lane-split reshapes either,
so this kernel never rearranges lanes: the input arrives as
(N, H, gw, p*c) — a free row-major reshape of the NHWC image — and the
kernel contracts each of the p patch rows separately with its (p*c, D)
weight slice, accumulating in fp32:

    y[(rp, pw), :] = sum_pi x[rp, pi, pw, :] @ W[pi]   (+ bias)

Identical math to the flat (p*p*c, D) matmul up to fp32 reassociation
of the 16 partial sums (<= 1 output bf16 ulp observed); the fast
serving config opts in via ViTConfig.patch_fused, the parity path
keeps the XLA form.

Measured (interleaved fori_loop slope, v5e, batch 8, 480x480):
0.27-0.31 ms vs 0.36-0.57 XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, rows, patch, gw, dim):
    xb = x_ref[0]                          # (rows*p, gw, p*c) fp32
    pc = xb.shape[-1]
    xb = xb.reshape(rows, patch, gw, pc)   # leading-dim split only
    acc = jnp.zeros((rows * gw, dim), jnp.float32)
    for pi in range(patch):
        xs = xb[:, pi].reshape(rows * gw, pc).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            xs, w_ref[pi],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = (acc + b_ref[:]).astype(jnp.bfloat16)
    o_ref[0] = y.reshape(rows, gw, dim)


def patch_rows_per_step(gh: int) -> int:
    """Largest row-block (<= 8) dividing the patch grid height."""
    for r in (8, 7, 6, 5, 4, 3, 2, 1):
        if gh % r == 0:
            return r
    return 1


@functools.partial(jax.jit, static_argnames=("patch", "dim", "interpret"))
def patch_embed_fused(
    x: jnp.ndarray,        # (N, H, W, C) fp32/bf16 image
    kernel: jnp.ndarray,   # (p, p, C, D) fp32 patch-embed weights
    bias: jnp.ndarray,     # (D,) fp32
    patch: int,
    dim: int,
    interpret: bool = None,
) -> jnp.ndarray:          # (N, gh*gw, D) bf16
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    p = patch
    gh, gw = h // p, w // p
    rows = patch_rows_per_step(gh)

    xr = x.astype(jnp.float32).reshape(n, h, gw, p * c)
    k3 = kernel.reshape(p, p * c, dim).astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, patch=p, gw=gw, dim=dim),
        grid=(n, gh // rows),
        in_specs=[
            pl.BlockSpec((1, rows * p, gw, p * c),
                         lambda ni, r: (ni, r, 0, 0)),
            pl.BlockSpec((p, p * c, dim), lambda ni, r: (0, 0, 0)),
            pl.BlockSpec((1, dim), lambda ni, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, gw, dim),
                               lambda ni, r: (ni, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, gh, gw, dim), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xr, k3, bias.astype(jnp.float32).reshape(1, dim))
    return out.reshape(n, gh * gw, dim)
