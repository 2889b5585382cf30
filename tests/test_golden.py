"""Golden regression: the tiny model's forward on frozen params/inputs
must keep producing the stored logits. Catches unintended numeric drift
from refactors (layout changes, fusion rewrites, dtype slips).
Regenerate with tests/make_golden.py ONLY for intentional changes."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.testing import tiny_vit_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_tiny.npz")


def _unflatten(flat):
    out = {}
    for key in flat.files:
        if key.startswith("__"):
            continue
        parts = key.split("/")[1:]  # drop the 'v' root
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden file")
def test_tiny_model_matches_golden():
    flat = np.load(GOLDEN)
    variables = _unflatten(flat)
    model = LSegNet(tiny_vit_config())
    out = np.asarray(model.apply(
        variables, jnp.asarray(flat["__x"]), jnp.asarray(flat["__txt"])
    ))
    np.testing.assert_allclose(out, flat["__out"], rtol=1e-4, atol=1e-4)
