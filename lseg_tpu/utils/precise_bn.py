"""Precise-BN: re-estimate BatchNorm running statistics on training data
before evaluation (the reference's --acc-bn path, test_lseg.py:281-303,
via encoding.utils.precise_bn.update_bn_stats — equal-weighted average
of per-batch moments, not the EMA).

flax BatchNorm updates running stats as `r' = m*r + (1-m)*batch`; the
per-batch moments are recovered exactly as `batch = (r' - m*r)/(1-m)`,
so no model changes are needed: run train-mode forwards, invert the EMA
update per batch, and average.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def update_bn_stats(
    apply_fn: Callable,
    variables,
    batches: Iterable,
    momentum: float = 0.9,
    max_batches: int = 200,
) -> dict:
    """Returns a new `batch_stats` tree holding the equal-weighted mean
    of per-batch moments over up to `max_batches` train-mode forwards.

    `apply_fn(variables, batch) -> mutated_batch_stats` runs ONE forward
    in train mode with mutable=['batch_stats'] and returns the mutated
    collection.
    """
    stats = variables.get("batch_stats", {})
    if not stats:
        return stats
    acc = jax.tree_util.tree_map(
        lambda a: np.zeros_like(np.asarray(a, np.float64)), stats
    )
    n = 0
    for batch in batches:
        if n >= max_batches:
            break
        mutated = apply_fn(
            {"params": variables["params"], "batch_stats": stats}, batch
        )
        recovered = jax.tree_util.tree_map(
            lambda new, old: (
                np.asarray(new, np.float64)
                - momentum * np.asarray(old, np.float64)
            ) / (1.0 - momentum),
            mutated, stats,
        )
        acc = jax.tree_util.tree_map(
            lambda a, r: a + r, acc, recovered
        )
        n += 1
    if n == 0:
        return stats
    return jax.tree_util.tree_map(
        lambda a, ref: (a / n).astype(np.asarray(ref).dtype), acc, stats
    )
