"""C++ decoder tests: PIL-exact grayscale decode for PNG (8-bit gray, RGB,
palette) and near-exact JPEG; parallel batch API; failure codes.

Builds native/decode/libcxrdecode.so on demand (skips when no toolchain)."""

import io
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from chestxray_vit_tpu.data import decode as dec

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "decode")


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not os.path.exists(os.path.join(NATIVE_DIR, "libcxrdecode.so")):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"cannot build native decoder: {e}")
    if not dec.native_available():
        pytest.skip("native decoder failed to load")


def _png(arr, mode="L"):
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg(arr, mode="L", quality=95):
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_png_gray_exact(rng):
    arr = rng.integers(0, 255, (96, 128), np.uint8)
    out = dec.decode_gray_native(_png(arr))
    np.testing.assert_array_equal(out, arr)


def test_png_rgb_matches_pil_luma(rng):
    arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
    data = _png(arr, "RGB")
    ours = dec.decode_gray_native(data)
    ref = dec.decode_gray_pil(data)
    # identical ITU-R 601-2 integer formula
    np.testing.assert_array_equal(ours, ref)


def test_jpeg_close_to_pil(rng):
    arr = rng.integers(0, 255, (64, 64), np.uint8)
    data = _jpeg(arr)
    ours = dec.decode_gray_native(data)
    ref = dec.decode_gray_pil(data)
    assert ours.shape == ref.shape
    # same libjpeg algorithms; allow ±1 for version differences
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_garbage_returns_none():
    assert dec.decode_gray_native(b"definitely not an image") is None
    assert dec.decode_gray_native(b"\x89PNG\r\n\x1a\ntruncated") is None


def test_too_large_for_buffer(rng):
    arr = rng.integers(0, 255, (64, 64), np.uint8)
    out = dec.decode_gray_native(_png(arr), max_side=32)
    assert out is None  # rc=-4 buffer too small


def test_batch_decode_parallel(rng):
    n = 12
    arrays = [rng.integers(0, 255, (48 + i, 64), np.uint8) for i in range(n)]
    blobs = [_png(a) for a in arrays]
    blobs[5] = b"corrupt"           # one failure
    blobs[7] = None                 # one missing
    canvas = np.zeros((n, 128, 128), np.uint8)
    hs, ws, rcs = dec.decode_batch_native(blobs, canvas, threads=4)
    for i, a in enumerate(arrays):
        if i in (5, 7):
            assert rcs[i] != 0
            continue
        assert rcs[i] == 0
        assert (hs[i], ws[i]) == a.shape
        np.testing.assert_array_equal(canvas[i, :hs[i], :ws[i]], a)


def test_native_preferred_in_decode_gray(rng):
    arr = rng.integers(0, 255, (32, 32), np.uint8)
    out = dec.decode_gray(_png(arr), prefer_native=True)
    np.testing.assert_array_equal(out, arr)


def test_png_gray16_strips_high_byte(rng):
    """16-bit grayscale PNG → high byte, matching PIL's 'I;16'→'L' semantics
    via libpng png_set_strip_16 (exercises the libdeflate fast path's
    bpp=2 unfilter + byte-select)."""
    arr16 = rng.integers(0, 65535, (64, 80), np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr16, "I;16").save(buf, format="PNG")
    # oracle: decode the PNG bytes back through PIL (the file stores
    # PNG-spec big-endian samples regardless of PIL's in-memory layout)
    out = dec.decode_gray_native(buf.getvalue())
    oracle = np.asarray(
        Image.open(io.BytesIO(buf.getvalue())), np.uint16) >> 8
    np.testing.assert_array_equal(out, oracle.astype(np.uint8))


def test_png_gray_all_filter_types(rng):
    """Gradient+noise images steer PNG encoders through Sub/Up/Avg/Paeth
    filters; decode must stay PIL-exact (pins the fast-path unfilter)."""
    yy, xx = np.mgrid[0:200, 0:160]
    for img in [
        ((xx * 255) // 160).astype(np.uint8),                 # row gradient
        ((yy * 255) // 200).astype(np.uint8),                 # col gradient
        (((xx + yy) * 255) // 360).astype(np.uint8),          # diagonal
        np.clip(((np.sin(yy / 9.0) + np.cos(xx / 7.0)) * 80 + 128), 0,
                255).astype(np.uint8),                        # smooth waves
        rng.integers(0, 255, (200, 160), np.uint8),           # noise
    ]:
        for level in (1, 6, 9):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG",
                                      compress_level=level)
            out = dec.decode_gray_native(buf.getvalue())
            np.testing.assert_array_equal(out, img)


def test_crop_pad_resize_matches_pil_chain(rng):
    """The C++ crop→pad→resize stage is byte-equal to the PIL host chain
    across crop geometries, up/downscale, stretch, and flip."""
    from chestxray_vit_tpu.data import geometry as geo
    from chestxray_vit_tpu.data import pipeline as pipe

    for _ in range(25):
        h, w = (int(x) for x in rng.integers(40, 500, 2))
        gray = rng.integers(0, 255, (h, w), np.uint8)
        cw = int(rng.integers(8, w + 1))
        ch = int(rng.integers(8, h + 1))
        left = int(rng.integers(0, w - cw + 1))
        top = int(rng.integers(0, h - ch + 1))
        out_size = int(rng.choice([64, 224, 384]))
        stretch = bool(rng.integers(0, 2))
        flip = bool(rng.integers(0, 2))
        box = geo.CropBox(left=left, top=top, width=cw, height=ch)
        native = pipe.host_resize(gray, box, out_size, stretch, flip,
                                  prefer_native=True)
        pil = pipe.host_resize(gray, box, out_size, stretch, flip,
                               prefer_native=False)
        np.testing.assert_array_equal(native, pil)


def test_png_gray16_pil_engine_matches_native(rng):
    """Both engines must produce identical pixels for 16-bit grayscale
    PNGs: PIL's convert('L') clamps raw 16-bit values at 255 (neither a
    luminance map nor libpng's strip-16), so decode_gray_pil takes the
    high byte explicitly."""
    arr16 = rng.integers(0, 65535, (48, 56), np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr16, "I;16").save(buf, format="PNG")
    data = buf.getvalue()
    via_pil = dec.decode_gray_pil(data)
    expected = (arr16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(via_pil, expected)
    if dec.native_available():
        np.testing.assert_array_equal(dec.decode_gray_native(data), expected)
