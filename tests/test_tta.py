"""Multi-scale sliding-window + flip TTA: the batched static-shape
pipeline must match a straightforward torch/NumPy oracle that implements
the reference protocol literally (per-scale resize -> pad -> window loop
-> flip sum -> count normalize -> resize back -> sum over scales,
reference additional_utils/encoding_models.py:54-155)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lseg_tpu.engine.tta import (
    MultiScaleEvaluator,
    TTAProtocol,
    make_plan,
)
from lseg_tpu.models.lseg import LSegNet
from lseg_tpu.testing import tiny_vit_config

PROTO = TTAProtocol(
    base_size=72,
    crop_size=64,
    scales=(0.5, 1.0, 1.5),
    flip=True,
)


def _model_and_inputs():
    cfg = tiny_vit_config()
    model = LSegNet(cfg)
    rng = np.random.RandomState(0)
    image = rng.randn(80, 100, 3).astype(np.float32)
    txt = jnp.asarray(rng.randn(4, cfg.out_c).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), txt
    )

    from lseg_tpu.engine.serve import make_logits_fn

    return make_logits_fn(model, variables), image, txt


def _oracle(apply_fn, image, txt, proto, num_classes):
    """Literal reference protocol in torch/NumPy; crop forwards go
    through the same jax model."""
    import torch
    import torch.nn.functional as F

    h, w, _ = image.shape
    crop = proto.crop_size
    x = torch.from_numpy(image).permute(2, 0, 1)[None]
    scores = torch.zeros(1, num_classes, h, w)
    pad_val = torch.tensor(proto.pad_value).view(1, 3, 1, 1)

    def logits(win_t):  # (1,3,c,c) torch -> (1,K,c,c) torch
        win = win_t.permute(0, 2, 3, 1).numpy()
        out = np.asarray(apply_fn(jnp.asarray(win), txt))
        return torch.from_numpy(out).permute(0, 3, 1, 2)

    for scale in proto.scales:
        hs, ws = proto.scaled_size(h, w, scale)
        cur = F.interpolate(x, (hs, ws), mode="bilinear",
                            align_corners=True)
        ph, pw = max(hs, crop), max(ws, crop)
        padded = pad_val.repeat(1, 1, ph, pw).clone()
        padded[:, :, :hs, :ws] = cur
        outputs = torch.zeros(1, num_classes, ph, pw)
        counts = torch.zeros(1, 1, ph, pw)
        for y0 in proto.window_positions(ph):
            for x0 in proto.window_positions(pw):
                win = padded[:, :, y0: y0 + crop, x0: x0 + crop]
                out = logits(win)
                if proto.flip:
                    out = out + torch.flip(
                        logits(torch.flip(win, [3])), [3]
                    )
                outputs[:, :, y0: y0 + crop, x0: x0 + crop] += out
                counts[:, :, y0: y0 + crop, x0: x0 + crop] += 1
        outputs = outputs / counts
        outputs = outputs[:, :, :hs, :ws]
        scores += F.interpolate(outputs, (h, w), mode="bilinear",
                                align_corners=True)
    return scores[0].permute(1, 2, 0).numpy()


def test_plan_window_coverage():
    plan = make_plan(PROTO, 80, 100)
    # every scale contributes at least one window; all origins in range
    crops = plan.crops[: plan.n_valid]
    assert set(crops[:, 0]) == {0, 1, 2}
    for s, y0, x0, v in crops:
        P = PROTO.canvas_sizes[s]
        assert 0 <= y0 <= P - PROTO.crop_size
        assert 0 <= x0 <= P - PROTO.crop_size
        assert v == 1


def test_tta_matches_oracle():
    apply_fn, image, txt, = _model_and_inputs()
    ev = MultiScaleEvaluator(apply_fn, num_classes=4, proto=PROTO)
    ours = ev(image, txt, return_logits=True)
    ref = _oracle(apply_fn, image, txt, PROTO, num_classes=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_device_pyramid_matches_host():
    """The device-built scale pyramid (in-trace iota interp weights) must
    equal the host build_pyramid (_interp_matrix) bit-for-bit-ish."""
    from lseg_tpu.engine.tta import (
        TTAPlan, _make_pyramid_builder, build_pyramid, make_plan,
    )

    rng = np.random.RandomState(3)
    image = rng.randn(80, 100, 3).astype(np.float32)
    plan = make_plan(PROTO, 80, 100)
    host = build_pyramid(PROTO, image, plan)

    builder = _make_pyramid_builder(PROTO)
    hb, wb = 128, 128  # any bucket >= image
    img = np.zeros((hb, wb, 3), np.float32)
    img[:80, :100] = image
    dev = np.asarray(builder(
        jnp.asarray(img), jnp.asarray([80, 100], np.int32),
        jnp.asarray(plan.sizes, np.int32),
    ))
    # fp32 in-trace src vs the host matrices' fp64 src: ~3e-5 slack
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_host_pyramid_path_still_matches_oracle():
    apply_fn, image, txt, = _model_and_inputs()
    ev = MultiScaleEvaluator(apply_fn, num_classes=4, proto=PROTO,
                             device_pyramid=False)
    ours = ev(image, txt, return_logits=True)
    ref = _oracle(apply_fn, image, txt, PROTO, num_classes=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_tta_argmax_and_reuse():
    apply_fn, image, txt = _model_and_inputs()
    ev = MultiScaleEvaluator(apply_fn, num_classes=4, proto=PROTO)
    pred = ev(image, txt)
    assert pred.shape == (80, 100)
    assert pred.dtype == np.int32
    # second image of a different size reuses program A (no rebuild)
    image2 = np.random.RandomState(1).randn(64, 72, 3).astype(np.float32)
    pred2 = ev(image2, txt)
    assert pred2.shape == (64, 72)
    logits = ev(image, txt, return_logits=True)
    np.testing.assert_array_equal(np.argmax(logits, -1), pred)


def test_single_scale_evaluator():
    from lseg_tpu.engine.eval_single import SingleScaleEvaluator

    apply_fn, _, txt = _model_and_inputs()
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    tgts = jnp.asarray(rng.randint(0, 4, (2, 64, 64)).astype(np.int32))
    ev = SingleScaleEvaluator(apply_fn, num_classes=4, flip=True)
    pred = ev(imgs, txt)
    assert pred.shape == (2, 64, 64)
    correct, labeled, inter, union = ev.metrics(imgs, tgts, txt)
    assert int(labeled) == 2 * 64 * 64
    assert inter.shape == (4,)


def test_tta_no_flip_matches_oracle():
    proto = TTAProtocol(base_size=72, crop_size=64,
                        scales=(0.5, 1.0), flip=False)
    apply_fn, image, txt = _model_and_inputs()
    ev = MultiScaleEvaluator(apply_fn, num_classes=4, proto=proto)
    ours = ev(image, txt, return_logits=True)
    ref = _oracle(apply_fn, image, txt, proto, num_classes=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_tta_image_smaller_than_crop():
    # every scale pads up to the crop (the reference's small-image
    # branch, encoding_models.py:88-101)
    proto = TTAProtocol(base_size=48, crop_size=64,
                        scales=(0.5, 1.0), flip=True)
    apply_fn, _, txt = _model_and_inputs()
    image = np.random.RandomState(3).randn(40, 30, 3).astype(np.float32)
    ev = MultiScaleEvaluator(apply_fn, num_classes=4, proto=proto)
    ours = ev(image, txt, return_logits=True)
    ref = _oracle(apply_fn, image, txt, proto, num_classes=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
