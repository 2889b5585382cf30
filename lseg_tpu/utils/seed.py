"""Determinism helper — the reference seeds torch/np/random before the
episodic protocol (reference: fewshot_data/common/utils.py:8-17,
test_lseg_zs.py:288). JAX PRNG is explicit, so this seeds the host-side
RNGs (episode sampling, augmentation) and returns the root jax key."""

from __future__ import annotations

import random

import numpy as np


def fix_randseed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
