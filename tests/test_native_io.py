"""Native (C++) data-loader core: build, decode, resize, normalize."""

import numpy as np
import pytest
from PIL import Image

from lseg_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lseg_io unavailable (no g++/libjpeg/libpng)")
    return True


def test_jpeg_roundtrip(tmp_path, lib_ok):
    rng = np.random.RandomState(0)
    # smooth image: JPEG is lossy, keep gradients gentle
    x = np.linspace(0, 255, 48 * 64 * 3).reshape(48, 64, 3)
    arr = x.astype(np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(arr).save(p, quality=95)
    got = native.decode(str(p))
    assert got is not None and got.shape == (48, 64, 3)
    pil = np.asarray(Image.open(p).convert("RGB"))
    assert np.abs(got.astype(int) - pil.astype(int)).mean() < 2.0


def test_png_mask_roundtrip(tmp_path, lib_ok):
    mask = np.random.RandomState(0).randint(
        0, 200, (30, 40), dtype=np.uint8
    )
    p = tmp_path / "m.png"
    Image.fromarray(mask).save(p)
    got = native.decode(str(p), mask=True)
    assert got is not None
    np.testing.assert_array_equal(got, mask)  # lossless labels


def test_png_rgb_decode(tmp_path, lib_ok):
    arr = np.random.RandomState(1).randint(
        0, 255, (20, 25, 3), dtype=np.uint8
    )
    p = tmp_path / "c.png"
    Image.fromarray(arr).save(p)
    got = native.decode(str(p))
    np.testing.assert_array_equal(got, arr)


def test_load_image_f32_pipeline(tmp_path, lib_ok):
    arr = np.random.RandomState(2).randint(
        0, 255, (32, 32, 3), dtype=np.uint8
    )
    p = tmp_path / "b.png"
    Image.fromarray(arr).save(p)
    mean = std = (0.5, 0.5, 0.5)
    # same size: no resize; value check against the formula
    out = native.load_image_f32(str(p), (32, 32), mean, std)
    ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # resized path: sane range and shape
    out2 = native.load_image_f32(str(p), (16, 24), mean, std)
    assert out2.shape == (16, 24, 3)
    assert np.all(out2 >= -1.0) and np.all(out2 <= 1.0)


def test_resize_nearest_matches_numpy(lib_ok):
    m = np.arange(35, dtype=np.int32).reshape(5, 7)
    got = native.resize_nearest_i32(m, 9, 4)
    h, w = m.shape
    ys = (np.arange(9) * (h / 9)).astype(np.int64)
    xs = (np.arange(4) * (w / 4)).astype(np.int64)
    np.testing.assert_array_equal(got, m[ys][:, xs])
