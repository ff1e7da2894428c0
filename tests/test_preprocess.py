"""Preprocessing tests: geometry parity with the reference's PIL chain, and
the fused device op against the PIL oracle (SURVEY §4: preprocessing
geometry unit tests — pad_to_square centering, bbox clamping/degenerate
fallback)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from chestxray_vit_tpu.config import PROCESSOR_MEAN as VIT_MEAN, PROCESSOR_STD as VIT_STD
from chestxray_vit_tpu.data import geometry as geo
from chestxray_vit_tpu.data.metadata import BBox
from chestxray_vit_tpu.data.pipeline import host_resize
from chestxray_vit_tpu.ops.preprocess import fused_preprocess, normalize_u8


# ---------------------------------------------------------------------------
# Reference chain in PIL, verbatim semantics (the oracle)
# ---------------------------------------------------------------------------

def pil_pad_to_square(img: Image.Image, padding_value=0) -> Image.Image:
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    out = Image.new("L", (side, side), padding_value)
    if w > h:
        out.paste(img, (0, (w - h) // 2))
    else:
        out.paste(img, ((h - w) // 2, 0))
    return out


def pil_reference_chain(gray: np.ndarray, bbox, out_size=64) -> np.ndarray:
    img = Image.fromarray(gray, "L")
    w, h = img.size
    if bbox is not None:
        x, y, bw, bh = int(bbox.x), int(bbox.y), int(bbox.w), int(bbox.h)
        left, upper = max(0, x), max(0, y)
        right, lower = min(w, x + bw), min(h, y + bh)
        if right <= left or lower <= upper or bw <= 0 or bh <= 0:
            img = pil_pad_to_square(img)
        else:
            img = pil_pad_to_square(img.crop((left, upper, right, lower)))
    else:
        img = pil_pad_to_square(img)
    img = img.resize((out_size, out_size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


# ---------------------------------------------------------------------------
# Geometry unit tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h,expected", [
    (10, 10, (10, 0, 0)),
    (20, 10, (20, 0, 5)),   # wide: top offset (w-h)//2
    (10, 20, (20, 5, 0)),   # tall: left offset (h-w)//2
    (21, 10, (21, 0, 5)),   # integer-division rounding
])
def test_pad_to_square_offsets(w, h, expected):
    assert geo.pad_to_square_offsets(w, h) == expected


@pytest.mark.parametrize("bbox,expected", [
    (BBox("L", 10, 20, 30, 40), (10, 20, 30, 40)),
    (BBox("L", -5, -5, 30, 40), (0, 0, 25, 35)),         # clamped at 0
    (BBox("L", 90, 90, 50, 50), (90, 90, 10, 10)),       # clamped at edge
    (BBox("L", 120, 0, 30, 30), None),                   # fully outside
    (BBox("L", 10, 10, 0, 10), None),                    # zero width
    (BBox("L", 10, 10, -3, 10), None),                   # negative
])
def test_clamp_bbox(bbox, expected):
    out = geo.clamp_bbox(bbox, 100, 100)
    if expected is None:
        assert out is None
    else:
        assert (out.left, out.top, out.width, out.height) == expected


def test_select_crop_degenerate_falls_back_to_full():
    box = geo.select_crop(BBox("L", 500, 500, 10, 10), 100, 100)
    assert (box.left, box.top, box.width, box.height) == (0, 0, 100, 100)


def test_random_resized_crop_in_bounds(rng):
    for _ in range(200):
        box = geo.sample_random_resized_crop(rng, 100, 80)
        assert 0 <= box.left and box.left + box.width <= 100
        assert 0 <= box.top and box.top + box.height <= 80
        assert box.width > 0 and box.height > 0


# ---------------------------------------------------------------------------
# host_resize vs the verbatim PIL reference chain
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,bbox", [
    ((100, 100), None),
    ((80, 120), None),                       # wide → vertical pad
    ((120, 80), None),                       # tall → horizontal pad
    ((100, 100), BBox("L", 10, 20, 40, 30)),
    ((100, 100), BBox("L", -10, -10, 40, 30)),
    ((100, 100), BBox("L", 200, 200, 40, 30)),  # degenerate → full image
])
def test_host_resize_matches_pil_reference(rng, shape, bbox):
    gray = rng.integers(0, 255, shape, dtype=np.uint8)
    h, w = shape
    ref = pil_reference_chain(gray, bbox, out_size=64)
    box = geo.select_crop(bbox, w, h)
    ours = host_resize(gray, box, 64)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# Fused device op vs PIL oracle
# ---------------------------------------------------------------------------

def _denorm(x):
    return np.asarray(x) * np.asarray(VIT_STD) + np.asarray(VIT_MEAN)


@pytest.mark.parametrize("shape,bbox", [
    ((128, 128), None),
    ((96, 128), None),
    ((128, 128), BBox("L", 16, 24, 48, 40)),
    ((128, 128), BBox("L", 300, 0, 48, 40)),  # degenerate
])
def test_fused_preprocess_matches_pil(rng, shape, bbox):
    c = 128
    gray = rng.integers(0, 255, shape, dtype=np.uint8)
    h, w = shape
    canvas = np.zeros((c, c), np.uint8)
    canvas[:h, :w] = gray
    box = geo.select_crop(bbox, w, h)
    boxes = np.asarray([[box.left, box.top, box.width, box.height]], np.int32)
    out = fused_preprocess(jnp.asarray(canvas[None]), jnp.asarray(boxes),
                           out_size=64)
    ref = pil_reference_chain(gray, bbox, out_size=64).astype(np.float32) / 255
    got = _denorm(out[0])
    # all three channels identical (grayscale broadcast)
    np.testing.assert_allclose(got[..., 0], got[..., 1], atol=1e-6)
    # PIL parity within quantization tolerance (PIL rounds to u8 internally)
    err = np.abs(got[..., 0] - ref)
    assert err.max() <= 2.5 / 255, err.max()
    assert err.mean() <= 0.5 / 255


def test_fused_preprocess_flip(rng):
    c = 64
    canvas = rng.integers(0, 255, (c, c), dtype=np.uint8)
    boxes = np.asarray([[0, 0, c, c]], np.int32)
    plain = fused_preprocess(jnp.asarray(canvas[None]), jnp.asarray(boxes),
                             out_size=32)
    flipped = fused_preprocess(jnp.asarray(canvas[None]), jnp.asarray(boxes),
                               out_size=32,
                               flips=jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(flipped),
                               np.asarray(plain)[:, :, ::-1], atol=1e-6)


def test_fused_preprocess_stretch_mode(rng):
    """stretch=True resizes axes independently (RandomResizedCrop path)."""
    c = 64
    canvas = np.zeros((c, c), np.uint8)
    canvas[:, :32] = 200  # left half bright; crop the left half
    boxes = np.asarray([[0, 0, 32, 64]], np.int32)
    out = fused_preprocess(jnp.asarray(canvas[None]), jnp.asarray(boxes),
                           out_size=32, stretch=True)
    g = _denorm(out[0])[..., 0]
    assert g.min() > 0.7  # whole output comes from the bright region


def test_normalize_u8_matches_hf_processor_math(rng):
    img = rng.integers(0, 255, (2, 8, 8), dtype=np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(img)))
    ref = (img[..., None].astype(np.float32) / 255.0
           - np.asarray(VIT_MEAN, np.float32)) / np.asarray(VIT_STD, np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_preprocess_out_of_canvas_box_pads_black(rng):
    """A crop box reaching past the canvas must produce black padding like
    the PIL reference, not edge-replicated rows from the gather clamp."""
    c = 64
    canvas = np.full((c, c), 200, np.uint8)
    # box taller than the canvas: bottom half is out of range
    boxes = np.asarray([[0, 32, 64, 64]], np.int32)    # top=32, h=64 -> 96>64
    out = fused_preprocess(jnp.asarray(canvas[None]), jnp.asarray(boxes),
                           out_size=64)
    img = _denorm(out[0])[..., 0]
    # valid rows (top half) carry the canvas value; out-of-range rows are 0
    assert img[:16].mean() > 0.5
    assert np.allclose(img[40:], 0.0, atol=1e-6)
