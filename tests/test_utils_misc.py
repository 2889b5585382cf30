"""Utility coverage: raw params export/import round-trip, DPT-style
KeepAspectResize policies, protocol presets, StepTimer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data.transforms import KeepAspectResize
from lseg_tpu.engine.tta import CITYSCAPES_PROTOCOL, TTAProtocol, make_plan
from lseg_tpu.train.checkpoint import export_params, import_params


def test_export_import_roundtrip(tmp_path):
    class S:
        params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                  "b": {"c": np.ones(4, np.float32)}}
        batch_stats = {"bn": {"mean": np.zeros(3, np.float32)}}

    path = str(tmp_path / "params.npz")
    export_params(path, S())
    back = import_params(path)
    np.testing.assert_array_equal(back["params"]["a"], S.params["a"])
    np.testing.assert_array_equal(
        back["params"]["b"]["c"], S.params["b"]["c"]
    )
    np.testing.assert_array_equal(
        back["batch_stats"]["bn"]["mean"],
        S.batch_stats["bn"]["mean"],
    )


def test_keep_aspect_resize_modes():
    # lower_bound: both dims >= target, multiple of 32
    r = KeepAspectResize(480, 480, resize_method="lower_bound")
    ow, oh = r.get_size(640, 427)
    assert oh >= 480 and ow % 32 == 0 and oh % 32 == 0
    # upper_bound: both dims <= target
    r = KeepAspectResize(480, 480, resize_method="upper_bound")
    ow, oh = r.get_size(640, 427)
    assert ow <= 480 and ow % 32 == 0
    # callable resizes a PIL image
    img = Image.new("RGB", (640, 427))
    out = KeepAspectResize(480, 480)(img)
    assert out.size[0] % 32 == 0 and out.size[1] % 32 == 0


def test_keep_aspect_resize_letterbox():
    # upper_bound + letterbox: zero-pad symmetrically toward the
    # target; odd differences under-pad by 1 (reference quirk,
    # utils.py:315-321)
    img = Image.new("RGB", (640, 427), (200, 100, 50))
    r = KeepAspectResize(480, 480, resize_method="upper_bound",
                         letter_box=True)
    ow, oh = r.get_size(640, 427)
    out = np.asarray(r(img))
    top, left = (480 - oh) // 2, (480 - ow) // 2
    assert out.shape == (oh + 2 * top, ow + 2 * left, 3)
    if top:
        assert (out[:top] == 0).all() and (out[-top:] == 0).all()
    if left:
        assert (out[:, :left] == 0).all()
    assert (out[top + 1, left + 1] != 0).any()
    # lower_bound resizes PAST the target: letterbox must clamp the
    # negative pad to zero instead of crashing
    r2 = KeepAspectResize(480, 480, letter_box=True)
    out2 = np.asarray(r2(img))
    assert out2.shape[0] >= 480 and out2.shape[1] >= 480


def test_cityscapes_protocol_plan():
    p = CITYSCAPES_PROTOCOL
    assert p.stride == 512
    plan = make_plan(p, 1024, 2048)
    assert plan.n_valid <= p.max_crops
    # all windows in range for their canvases
    for s, y0, x0, v in plan.crops[: plan.n_valid]:
        assert 0 <= y0 <= p.canvas_sizes[s] - p.crop_size
        assert 0 <= x0 <= p.canvas_sizes[s] - p.crop_size


def test_step_timer():
    from lseg_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    x = jnp.ones((4,))
    assert t.step(x) is None
    assert t.step(x) is not None
    assert t.mean > 0
    assert t.throughput(8) > 0


def test_precise_bn_recovers_exact_batch_moments():
    """One batch: the recovered precise-BN stats must equal that batch's
    true moments (EMA inversion is exact)."""
    import flax.linen as nn

    from lseg_tpu.utils.precise_bn import update_bn_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=1e-5, name="bn",
            )(x)

    m = M()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 4).astype(np.float32) * 3 + 1)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)

    def apply_fn(v, batch):
        _, mut = m.apply(v, batch, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    new_stats = update_bn_stats(apply_fn, variables, [x])
    np.testing.assert_allclose(
        new_stats["bn"]["mean"], np.asarray(x).mean(0), rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        new_stats["bn"]["var"], np.asarray(x).var(0), rtol=1e-3,
        atol=1e-4,
    )


def test_area_resize_matches_cv2_inter_area():
    """area_resize == cv2.INTER_AREA to the uint8 rounding ulp on
    downscale AND same-direction fractional upscale (the reference
    Resize util's default interpolation, utils.py:211,332)."""
    cv2 = pytest.importorskip("cv2")
    from lseg_tpu.data.transforms import area_resize

    rng = np.random.RandomState(0)
    for (ih, iw), (oh, ow) in [((100, 150), (37, 53)),
                               ((480, 640), (384, 512)),
                               ((64, 64), (32, 32)),
                               ((50, 75), (65, 98))]:
        img = rng.randint(0, 256, (ih, iw, 3), np.uint8)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_AREA)
        got = area_resize(img, oh, ow)
        assert got.shape == ref.shape
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1, ((ih, iw), (oh, ow), diff.max())
    # grayscale 2-D path
    img = rng.randint(0, 256, (41, 67), np.uint8)
    ref = cv2.resize(img, (23, 17), interpolation=cv2.INTER_AREA)
    got = area_resize(img, 17, 23)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_keep_aspect_resize_uses_area_filter():
    """KeepAspectResize downscales with the INTER_AREA-equivalent
    filter by default and still honors interpolation='bilinear'."""
    cv2 = pytest.importorskip("cv2")
    from lseg_tpu.data.transforms import KeepAspectResize

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (700, 900, 3), np.uint8)
    img = Image.fromarray(arr)
    r = KeepAspectResize(480, 480, resize_method="lower_bound")
    out = np.asarray(r(img))
    ow, oh = r.get_size(900, 700)
    ref = cv2.resize(arr, (ow, oh), interpolation=cv2.INTER_AREA)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    r_b = KeepAspectResize(480, 480, resize_method="lower_bound",
                           interpolation="bilinear")
    out_b = np.asarray(r_b(img))
    assert out_b.shape == out.shape  # PIL path still available
