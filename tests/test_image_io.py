import numpy as np

from optixpathtracer_tpu.io.image import (
    load_hdr,
    load_image,
    load_pfm,
    save_hdr,
    save_pfm,
    save_png,
)


def test_hdr_roundtrip(tmp_path, rng):
    img = (rng.random((16, 32, 3)) * 8.0).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: absolute error is bounded by
    # one mantissa step of the per-pixel max channel
    step = img.max(axis=-1, keepdims=True) / 256.0
    assert np.all(np.abs(back - img) <= step + 1e-4)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.random((8, 12, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    save_pfm(p, img)
    np.testing.assert_allclose(load_pfm(p), img, rtol=1e-6)


def test_png_roundtrip(tmp_path, rng):
    img = rng.random((10, 14, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    save_png(p, img)
    back = load_image(p, flip_y=False)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-3)


def test_texture_yflip(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    img[0, :] = 1.0  # top row white
    p = str(tmp_path / "f.png")
    save_png(p, img)
    flipped = load_image(p, flip_y=True)
    assert flipped[-1].mean() > 0.9  # top row moved to bottom (Model.cpp:118-125)
