"""Correlation-head parity vs the reference's exact torch math,
including the fp16 quirk: the reference casts normalized features to
half before the matmul (`image_features.half() @ text_features.t()`,
reference modules/models/lseg_net.py:185-196)."""

import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.experimental
def test_head1_upsample_argmax_kernel_matches_composition():
    """The fully fused serving head (int8 head1 + deferred-norm
    correlation + x2 align-corners upsample + argmax) must agree with
    the composition of its tested pieces (head1_correlate_fused ->
    upsample2x bf16 -> argmax). Interp accumulation order differs
    (H-then-W blend vs W-then-H matmuls), so ties/near-ties may flip;
    require near-total agreement plus logit-level closeness implied by
    the pieces' own tests."""
    import jax

    from lseg_tpu.ops.pallas_correlation import (
        head1_correlate_fused,
        head1_correlate_upsample_argmax,
    )
    from lseg_tpu.ops.resize import upsample2x

    rng = np.random.RandomState(0)
    n, h, w, c, e, k = 2, 16, 16, 32, 64, 7
    xq = jnp.asarray(rng.randint(-127, 128, (n, h, w, c)), jnp.int8)
    sx = jnp.float32(0.02)
    w1q = jnp.asarray(rng.randint(-127, 128, (1, 1, c, e)), jnp.int8)
    s1 = jnp.asarray(rng.rand(e).astype(np.float32) * 0.01 + 1e-3)
    b1 = jnp.asarray(rng.randn(e).astype(np.float32) * 0.1)
    txt = jnp.asarray(rng.randn(k, e).astype(np.float32))

    half = head1_correlate_fused(xq, sx, w1q, s1, b1, txt)
    want = np.asarray(jnp.argmax(
        upsample2x(half, align_corners=True,
                   compute_dtype=jnp.bfloat16), axis=-1))
    got = np.asarray(head1_correlate_upsample_argmax(
        xq, sx, w1q, s1, b1, txt, rows=4))
    assert got.shape == (n, 2 * h, 2 * w)
    agree = (got == want).mean()
    assert agree > 0.98, agree


@pytest.mark.experimental
def test_head1_wup_kernel_matches_composition():
    """head1_correlate_wup_fused (in-kernel x2 W-interp) must match
    head1_correlate_fused followed by a W-only bilinear resize."""
    from lseg_tpu.ops.pallas_correlation import (
        head1_correlate_fused,
        head1_correlate_wup_fused,
    )
    from lseg_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    n, h, w, c, e, k = 2, 8, 16, 32, 64, 7
    xq = jnp.asarray(rng.randint(-127, 128, (n, h, w, c)), jnp.int8)
    sx = jnp.float32(0.02)
    w1q = jnp.asarray(rng.randint(-127, 128, (1, 1, c, e)), jnp.int8)
    s1 = jnp.asarray(rng.rand(e).astype(np.float32) * 0.01 + 1e-3)
    b1 = jnp.asarray(rng.randn(e).astype(np.float32) * 0.1)
    txt = jnp.asarray(rng.randn(k, e).astype(np.float32))

    half = head1_correlate_fused(xq, sx, w1q, s1, b1, txt)
    want = np.asarray(resize_bilinear(
        half, h, 2 * w, align_corners=True,
        compute_dtype=jnp.bfloat16))
    got = np.asarray(head1_correlate_wup_fused(
        xq, sx, w1q, s1, b1, txt, rows=4))
    assert got.shape == (n, h, 2 * w, k)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32),
        rtol=0.02, atol=0.02)
