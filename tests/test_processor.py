"""ImageProcessor parity vs the real HF ViTImageProcessor (offline —
constructed from config, no hub)."""

import numpy as np
import pytest

from chestxray_vit_tpu.data.processor import ImageProcessor

transformers = pytest.importorskip("transformers")


def _hf_processor(size=64):
    return transformers.ViTImageProcessor(
        size={"height": size, "width": size})


@pytest.mark.parametrize("shape", [(64, 64), (100, 80), (48, 128, 3)])
def test_matches_hf_processor(rng, shape):
    arr = rng.integers(0, 255, shape, dtype=np.uint8)
    from PIL import Image
    img = Image.fromarray(arr, "L" if arr.ndim == 2 else "RGB")
    # the reference converts to RGB before the processor (pyc L296); HF's
    # processor rejects 2-dim grayscale arrays outright
    rgb = img.convert("RGB")
    ours = ImageProcessor(size=64)(images=[rgb])["pixel_values"]
    ref = _hf_processor(64)(images=[rgb], return_tensors="np")["pixel_values"]
    assert ours.shape == ref.shape == (1, 3, 64, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_numpy_input_and_channels_last(rng):
    arr = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    out = ImageProcessor(size=16, data_format="channels_last")(arr)
    assert out["pixel_values"].shape == (1, 16, 16, 3)


def test_jax_tensors(rng):
    arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    out = ImageProcessor(size=16)(arr, return_tensors="jax")
    import jax
    assert isinstance(out["pixel_values"], jax.Array)
