"""Native host-ops: build, PIL-parity of the antialiased resample, the
in-C++ JPEG decode path, and the batch path.

Round 1's native resize was a plain 2-tap bilinear lookup that diverged
from PIL's area-averaging BILINEAR on large downscales (ADVICE.md); the
contract now is parity with PIL for BOTH paths, so training data does
not depend on whether a C++ toolchain was available.
"""

import io

import numpy as np
import pytest
from PIL import Image

from imagegenerator_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native host ops"
)


def _pil_resize_normalize(img_u8, size):
    im = Image.fromarray(img_u8).resize((size, size), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0


def test_resample_matches_pil_downscale():
    """Large downscale (the COCO 640px -> 64px case ADVICE.md flagged):
    the antialiased triangle resample must track PIL BILINEAR closely
    (PIL uses 8-bit fixed-point accumulation -> small quantization gap)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    got = native.resize_normalize(img, 64)
    want = _pil_resize_normalize(img, 64)
    assert got.shape == (64, 64, 3)
    assert np.abs(got - want).max() < 2.5 / 255 * 2  # ~2.5 u8 levels
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_resample_matches_pil_asymmetric_and_upscale():
    rng = np.random.default_rng(1)
    for shape, size in [((48, 80), 64), ((100, 30), 32), ((7, 200), 32), ((20, 20), 64)]:
        img = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
        got = native.resize_normalize(img, size)
        want = _pil_resize_normalize(img, size)
        assert np.abs(got - want).max() < 2.5 / 255 * 2, (shape, size)


def test_decode_jpeg_matches_pil_chain():
    """Full in-C++ JPEG decode + resample vs PIL decode + PIL resize."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (320, 480, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    got = native.decode_jpeg_resize_normalize(data, 96)
    if got is None:
        pytest.skip("host_ops built without libjpeg")
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    want = _pil_resize_normalize(dec, 96)
    assert got.shape == (96, 96, 3)
    # identical libjpeg decode + near-identical resample
    assert np.abs(got - want).max() < 3.0 / 255 * 2


def test_decode_jpeg_fast_dct_close():
    """DCT-scaled decode trades exactness for ~3x decode speed; output
    must stay close to the exact path (it is a valid antialias too)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    exact = native.decode_jpeg_resize_normalize(buf.getvalue(), 64)
    fast = native.decode_jpeg_resize_normalize(buf.getvalue(), 64, fast_dct=True)
    if exact is None:
        pytest.skip("host_ops built without libjpeg")
    assert fast.shape == exact.shape
    # random noise is the worst case for DCT truncation; bound loosely
    assert np.abs(fast - exact).mean() < 0.12


def test_decode_jpeg_rejects_garbage():
    assert native.decode_jpeg_resize_normalize(b"\xff\xd8garbage", 32) is None


def test_decode_path_used_by_dataset(monkeypatch):
    """coco.decode_resize_normalize must give the same pixels for the
    native JPEG path and the PIL fallback (with the DCT-scaled fast
    decode — the round-3 default — disabled for this exactness check)."""
    from imagegenerator_tpu.data.coco import decode_resize_normalize

    monkeypatch.setenv("IMAGEGEN_FAST_DCT", "0")
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    native_out = decode_resize_normalize(buf.getvalue(), 64)

    # PNG goes through PIL decode + native resample
    buf_png = io.BytesIO()
    dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    Image.fromarray(dec).save(buf_png, format="PNG")
    png_out = decode_resize_normalize(buf_png.getvalue(), 64)
    np.testing.assert_allclose(native_out, png_out, atol=1e-5)


def test_decode_path_default_is_fast_dct(monkeypatch):
    """The dataset decode path defaults to the DCT-scaled fast decode
    (2.07x at 640->256px, photographic parity <1 gray level mean) and
    IMAGEGEN_FAST_DCT=0 opts back into the exact decode."""
    from imagegenerator_tpu.data.coco import decode_resize_normalize

    monkeypatch.delenv("IMAGEGEN_FAST_DCT", raising=False)
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    if native.decode_jpeg_resize_normalize(buf.getvalue(), 64) is None:
        pytest.skip("host_ops built without libjpeg")
    default_out = decode_resize_normalize(buf.getvalue(), 64)
    fast = native.decode_jpeg_resize_normalize(buf.getvalue(), 64, fast_dct=True)
    exact = native.decode_jpeg_resize_normalize(buf.getvalue(), 64, fast_dct=False)
    np.testing.assert_array_equal(default_out, fast)
    assert np.abs(fast - exact).max() > 0  # the two decodes are distinct
    monkeypatch.setenv("IMAGEGEN_FAST_DCT", "0")
    np.testing.assert_array_equal(
        decode_resize_normalize(buf.getvalue(), 64), exact
    )


def test_resize_u8_matches_pil_bytes():
    """The u8-output resample (the device-normalize transfer path) must
    match PIL's own u8 Resize output closely — PIL quantizes to u8 after
    the same triangle filter, so both paths round the same float values
    (PIL's 8-bit fixed-point weights allow a couple levels of drift)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    got = native.resize_u8(img, 64)
    if got is None:
        pytest.skip("host_ops built without the u8 entry points")
    want = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BILINEAR), np.uint8
    )
    assert got.shape == (64, 64, 3) and got.dtype == np.uint8
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 3


def test_resize_u8_quantizes_the_f32_path():
    """normalize(resize_u8(x)) == round-to-u8 of resize_normalize(x):
    the u8 path is exactly the f32 path plus one PIL-convention
    rounding to bytes, nothing else."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (123, 77, 3), dtype=np.uint8)
    u8 = native.resize_u8(img, 48)
    if u8 is None:
        pytest.skip("host_ops built without the u8 entry points")
    f32 = native.resize_normalize(img, 48)
    # invert the normalize, round the way the C++ writer does
    levels = (f32 + 1.0) * (255.0 / 2.0)
    expect = np.clip(np.floor(levels + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(u8, expect)


def test_decode_jpeg_u8_matches_f32_decode():
    """In-C++ JPEG decode with u8 output vs f32 output: same decode +
    resample, differing only by the final quantization."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, (320, 480, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    u8 = native.decode_jpeg_resize_u8(buf.getvalue(), 96)
    if u8 is None:
        pytest.skip("host_ops built without libjpeg/u8 entry points")
    f32 = native.decode_jpeg_resize_normalize(buf.getvalue(), 96)
    norm8 = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    assert np.abs(norm8 - f32).max() <= 0.5 * 2.0 / 255.0 + 1e-6


def test_batch_resize_normalize():
    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for h, w in [(48, 80), (64, 64), (100, 30), (7, 200)]
    ]
    got = native.batch_resize_normalize(imgs, 32, num_threads=3)
    assert got.shape == (4, 32, 32, 3)
    for i, im in enumerate(imgs):
        np.testing.assert_allclose(
            got[i], native.resize_normalize(im, 32), atol=1e-6
        )
