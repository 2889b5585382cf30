"""Regenerate tests/golden/golden_tiny.npz — frozen tiny-model params,
inputs, and outputs used by test_golden.py to catch unintended numeric
drift across refactors. Run manually after INTENTIONAL semantic changes:

    python tests/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lseg_tpu.models.lseg import LSegNet  # noqa: E402
from lseg_tpu.testing import tiny_vit_config  # noqa: E402


def main():
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    txt = rng.randn(4, cfg.out_c).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(txt)
    )
    out = np.asarray(model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(txt)))

    flat = {"__x": x, "__txt": txt, "__out": out}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}", v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("v", variables)
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "golden_tiny.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **flat)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB), "
          f"out mean {out.mean():.6f}")


def main_trained():
    """Regenerate tests/golden/trained_tiny.npz — the converged tiny
    checkpoint gating the fast-int8 stack (~15 min on a 1-CPU host;
    see tests/test_quant.py::test_trained_model_fast_int8_miou_parity).
    """
    from lseg_tpu.testing import save_tree_npz, train_tiny_checkpoint

    trained, final_loss = train_tiny_checkpoint()
    assert final_loss < 0.15, final_loss
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "trained_tiny.npz")
    save_tree_npz(path, trained)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB), "
          f"final loss {final_loss:.4f}")


def main_half_trained():
    """Regenerate tests/golden/trained_tiny_half.npz — the HALF-trained
    (600-step, softer-margin) checkpoint behind the int8 drift-bound
    gate (tests/test_quant.py::test_half_trained_model_int8_drift_bound
    — int8 error grows as margins soften; this pins the measured
    soft-margin bound so regressions are caught)."""
    from lseg_tpu.testing import save_tree_npz, train_tiny_checkpoint

    trained, final_loss = train_tiny_checkpoint(steps=600)
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "trained_tiny_half.npz")
    save_tree_npz(path, trained)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB), "
          f"final loss {final_loss:.4f}")


if __name__ == "__main__":
    if "--trained" in sys.argv:
        main_trained()
    elif "--half" in sys.argv:
        main_half_trained()
    else:
        main()
