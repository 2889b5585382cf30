"""Correlation-head parity vs the reference's exact torch math,
including the fp16 quirk: the reference casts normalized features to
half before the matmul (`image_features.half() @ text_features.t()`,
reference modules/models/lseg_net.py:185-196)."""

import jax.numpy as jnp
import numpy as np
import torch

from lseg_tpu.ops.correlation import correlate


def _ref_logits(img, txt, scale, half):
    ti = torch.from_numpy(img.reshape(-1, img.shape[-1]))
    tt = torch.from_numpy(txt)
    ti = ti / ti.norm(dim=-1, keepdim=True)
    tt = tt / tt.norm(dim=-1, keepdim=True)
    if half:
        ti, tt = ti.half(), tt.half()
    out = (scale * ti @ tt.t()).float().numpy()
    return out.reshape(*img.shape[:-1], txt.shape[0])


def test_correlate_fp32_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 6, 7, 32).astype(np.float32)
    txt = rng.randn(5, 32).astype(np.float32)
    ours = np.asarray(correlate(jnp.asarray(img), jnp.asarray(txt)))
    ref = _ref_logits(img, txt, 1.0 / 0.07, half=False)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_correlate_fp16_emulation_matches_torch():
    rng = np.random.RandomState(1)
    img = rng.randn(1, 8, 8, 64).astype(np.float32)
    txt = rng.randn(7, 64).astype(np.float32)
    ours = np.asarray(correlate(
        jnp.asarray(img), jnp.asarray(txt), emulate_fp16=True
    ))
    ref = _ref_logits(img, txt, 1.0 / 0.07, half=True)
    # same fp16 quantization of the operands; accumulation differs
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-2)
    # and the fp16 path must differ measurably from the fp32 path
    # (same quirk the reference has)
    full = np.asarray(correlate(jnp.asarray(img), jnp.asarray(txt)))
    assert np.max(np.abs(full - ours)) > 1e-6
