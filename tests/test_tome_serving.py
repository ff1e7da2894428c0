"""Predictor(tome_r=...): token merging through the serving surface —
composes with the plain and quantized forwards, keeps output shapes, and
tracks the full model closely at small r.
"""

import io

import jax
import numpy as np
import pytest

from chestxray_vit_tpu.config import ModelConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.serve.inference import Predictor


def _cfg():
    return ModelConfig(img_size=64, patch_size=8, hidden_size=64,
                       num_heads=4, num_layers=4, mlp_dim=128,
                       num_classes=5, remat=False, attention_impl="xla",
                       dtype="float32")


def _png(seed, size=96):
    from PIL import Image
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (size, size), np.uint8),
                          "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    return cfg, params, [_png(i) for i in range(3)]


def test_tome_composes_with_plain_and_quantized(setup):
    cfg, params, pngs = setup
    base = Predictor(params, cfg, batch_size=4).predict_bytes(pngs)
    for quantize in (False, "static", "dynamic"):
        pred = Predictor(params, cfg, batch_size=4, quantize=quantize,
                         tome_r=1)
        out = pred.predict_bytes(pngs)
        assert out.probs.shape == base.probs.shape
        corr = np.corrcoef(base.logits.ravel(), out.logits.ravel())[0, 1]
        # r=1 merges one near-duplicate pair per layer: logits track the
        # full model closely
        assert corr > 0.98, (quantize, corr)


def test_tome_rollout_maps_stay_full_token(setup):
    cfg, params, pngs = setup
    pred = Predictor(params, cfg, batch_size=4, tome_r=2)
    out = pred.predict_bytes(pngs, with_maps=True)
    g = cfg.img_size // cfg.patch_size
    assert out.maps.shape == (len(pngs), g, g)   # full 8×8 token grid
