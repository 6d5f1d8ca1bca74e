"""Native host-ops: build, correctness vs numpy bilinear, batch path."""

import numpy as np
import pytest

from imagegenerator_tpu.data import native


def _numpy_resize_normalize(img_u8, size):
    """Reference bilinear with half-pixel centers + [-1,1] normalize."""
    h, w, c = img_u8.shape
    fy = np.clip((np.arange(size) + 0.5) * (h / size) - 0.5, 0, h - 1)
    fx = np.clip((np.arange(size) + 0.5) * (w / size) - 0.5, 0, w - 1)
    y0 = fy.astype(int)
    x0 = fx.astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    img = img_u8.astype(np.float32)
    out = (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    return out * (2.0 / 255.0) - 1.0


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native host ops"
)


def test_resize_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
    got = native.resize_normalize(img, 64)
    want = _numpy_resize_normalize(img, 64)
    assert got.shape == (64, 64, 3)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_batch_resize_normalize():
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for h, w in [(48, 80), (64, 64), (100, 30), (7, 200)]
    ]
    got = native.batch_resize_normalize(imgs, 32, num_threads=3)
    assert got.shape == (4, 32, 32, 3)
    for i, im in enumerate(imgs):
        np.testing.assert_allclose(
            got[i], _numpy_resize_normalize(im, 32), atol=1e-4
        )
