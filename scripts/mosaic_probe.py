"""Minimal probes for the Mosaic 'Invalid input layout' toolchain
regression (round-4 BENCH failure): broadcasting a LANE-OFFSET slice of
a one-row (1, 384) block against a (T, 128) accumulator is rejected by
the current compiler (`vector.broadcast` with in_layout lane offset
128). Each probe compiles a tiny kernel isolating one construct so fix
candidates can be validated on the chip before editing the real
kernels.

Usage: python scripts/mosaic_probe.py <variant>
  sliced   — the failing construct (expect FAIL on the new toolchain)
  rows     — scales as (3, 128) block, whole-sublane-row indexing
  rows1d   — same but loading ref[i] directly (1-D lane vector)
  bcast    — sliced + explicit jnp.broadcast_to before the multiply
"""
import sys
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

T, D = 904, 1024


def _body(acc, sw_ref, variant, i):
    lo = i * 128
    if variant == "sliced":
        return acc * sw_ref[0][:, lo:lo + 128]
    if variant == "rows":
        return acc * sw_ref[i:i + 1]          # (1, 128), sublane row i
    if variant == "rows1d":
        return acc * sw_ref[i]                # (128,) lane vector
    if variant == "bcast":
        sl = sw_ref[0][:, lo:lo + 128]
        return acc * jnp.broadcast_to(sl, acc.shape)
    raise ValueError(variant)


def kernel(x_ref, w_ref, sw_ref, o_ref, *, variant):
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                     # (T, 128)
    parts = [_body(acc, sw_ref, variant, i) for i in range(3)]
    o_ref[0] = sum(parts).astype(jnp.bfloat16)


def main(variant):
    if variant in ("rows", "rows1d"):
        sw_shape, sw_block = (3, 128), (3, 128)
        sw_index = lambda ni: (0, 0)
    else:
        # match the real kernels: (1, 1, 384) 3-D block, [0] -> (1, 384)
        sw_shape, sw_block = (1, 1, 384), (1, 1, 384)
        sw_index = lambda ni: (0, 0, 0)

    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((D, 128), lambda ni: (0, 0)),
            pl.BlockSpec(sw_block, sw_index),
        ],
        out_specs=pl.BlockSpec((1, T, 128), lambda ni: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, T, 128), jnp.bfloat16),
    )
    x = jnp.zeros((2, T, D), jnp.int8)
    w = jnp.zeros((D, 128), jnp.int8)
    sw = jnp.ones(sw_shape, jnp.float32)
    jax.jit(f).lower(x, w, sw).compile()
    print(f"{variant}: OK")


if __name__ == "__main__":
    main(sys.argv[1])
