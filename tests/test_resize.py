"""Bilinear resize parity vs the torch oracle (both align_corners modes)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lseg_tpu.ops.resize import resize_bilinear, upsample2x


def _torch_resize(x_nhwc, out_h, out_w, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = F.interpolate(
        t, (out_h, out_w), mode="bilinear", align_corners=align_corners
    )
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((24, 24), (30, 30)),     # pos-embed grid resize (up)
        ((24, 24), (15, 20)),     # pos-embed grid resize (down, non-square)
        ((16, 16), (32, 32)),     # fusion x2 upsample
        ((240, 240), (480, 480)),  # output head x2
        ((13, 17), (29, 31)),     # odd sizes
        ((8, 8), (8, 8)),         # identity
        ((5, 5), (1, 1)),         # degenerate output
        ((1, 7), (4, 14)),        # degenerate input
    ],
)
def test_resize_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(
        resize_bilinear(jnp.asarray(x), *out_hw, align_corners=align_corners)
    )
    want = _torch_resize(x, *out_hw, align_corners)
    # torch lerps as x0 + f*(x1-x0); the matmul form is w0*x0 + w1*x1 —
    # same math, different fp rounding. Bound the absolute error only.
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_upsample2x():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 10, 4), dtype=np.float32)
    got = np.asarray(upsample2x(jnp.asarray(x)))
    want = _torch_resize(x, 24, 20, True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hwc_input():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 6, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 12, 12))
    want = _torch_resize(x[None], 12, 12, True)[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_order_wh_matches_hw():
    """resize_bilinear(order='wh') is the same separable interp with
    the W matmul applied first — equal to 'hw' up to fp rounding."""
    import numpy as np

    from lseg_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
    a = np.asarray(resize_bilinear(x, 13, 4, align_corners=True))
    b = np.asarray(resize_bilinear(x, 13, 4, align_corners=True,
                                   order="wh"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    a = np.asarray(resize_bilinear(x, 14, 18, align_corners=False))
    b = np.asarray(resize_bilinear(x, 14, 18, align_corners=False,
                                   order="wh"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_resize_collapse_matches_rank4():
    """collapse=True contracts the same interp dots over merged-dim
    rank-3 views — the arithmetic is identical to the rank-4 einsum
    form (same contraction over the same elements), so results must
    match to the bit on CPU."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
    for ac, (oh, ow) in [(True, (14, 18)), (False, (13, 4)),
                         (True, (7, 9))]:  # incl. identity
        a = np.asarray(resize_bilinear(x, oh, ow, align_corners=ac))
        b = np.asarray(resize_bilinear(x, oh, ow, align_corners=ac,
                                       collapse=True))
        np.testing.assert_array_equal(a, b)
    # upsample2x passthrough + bf16 compute dtype (the serving form)
    a = np.asarray(upsample2x(x, compute_dtype=jnp.bfloat16))
    b = np.asarray(upsample2x(x, compute_dtype=jnp.bfloat16,
                              collapse=True))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
