"""Data-parallel serving: Predictor(data_parallel=N) shards micro-batches
over a ``data`` mesh axis with replicated params (serve/inference.py).
Runs on the virtual 8-device CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from chestxray_vit_tpu.config import ModelConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.serve.inference import Predictor


def _cfg():
    return ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                       num_layers=2, num_heads=4, mlp_dim=128,
                       num_classes=5, dtype="float32",
                       attention_impl="xla")


def _grays(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (96, 80), np.uint8) for _ in range(n)]


def test_dp_matches_single_device():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    grays = _grays(11)                      # odd count: exercises buckets
    single = Predictor(params, cfg, batch_size=8)
    dp = Predictor(params, cfg, batch_size=8, data_parallel=True)
    assert dp.mesh is not None and dp.mesh.shape["data"] == 8
    a = single.predict_arrays(grays)
    b = dp.predict_arrays(grays)
    np.testing.assert_allclose(b.probs, a.probs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.logits, a.logits, rtol=1e-4, atol=1e-4)


def test_dp_bucket_rounds_to_mesh_multiple():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    dp = Predictor(params, cfg, batch_size=8, data_parallel=8)
    for valid, want in ((1, 8), (5, 8), (8, 8)):
        assert dp._bucket(valid, 8) == want
    dp2 = Predictor(params, cfg, batch_size=8, data_parallel=2)
    assert dp2._bucket(1, 8) == 2
    assert dp2._bucket(3, 8) == 4


def test_dp_warmup_compiles_collapsed_buckets():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    dp = Predictor(params, cfg, batch_size=8, data_parallel=8)
    dp.warmup()                              # one bucket (8) — must not raise
    out = dp.predict_arrays(_grays(3))
    assert out.probs.shape == (3, 5)


def test_dp_with_static_quantize():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    grays = _grays(6, seed=3)
    single = Predictor(params, cfg, batch_size=8)
    dp = Predictor(params, cfg, batch_size=8, data_parallel=True,
                   quantize="static")
    b = dp.predict_arrays(grays)
    a = single.predict_arrays(grays)
    assert np.abs(a.probs - b.probs).max() < 0.1


def test_dp_device_placement():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    grays = _grays(4, seed=5)
    single = Predictor(params, cfg, batch_size=4, placement="device")
    dp = Predictor(params, cfg, batch_size=4, placement="device",
                   data_parallel=4)
    a = single.predict_arrays(grays)
    b = dp.predict_arrays(grays)
    np.testing.assert_allclose(b.probs, a.probs, rtol=1e-5, atol=1e-5)


def test_dp_rollout_maps():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    grays = _grays(4, seed=7)
    single = Predictor(params, cfg, batch_size=4)
    dp = Predictor(params, cfg, batch_size=4, data_parallel=4)
    a = single.predict_arrays(grays, with_maps=True)
    b = dp.predict_arrays(grays, with_maps=True)
    assert b.maps.shape == a.maps.shape
    np.testing.assert_allclose(b.maps, a.maps, rtol=1e-4, atol=1e-5)


def test_dp_validation_errors():
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="divisible"):
        Predictor(params, cfg, batch_size=6, data_parallel=4)
    with pytest.raises(ValueError, match="devices"):
        Predictor(params, cfg, batch_size=64,
                  data_parallel=len(jax.devices()) + 1)


def test_dp_composes_with_tome_and_quantize():
    """tome_r + quantize + data_parallel together: the merged-token
    forward partitions over the data axis (top_k/routing are per-row
    batched ops) and matches the single-device tome output."""
    cfg = _cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    grays = _grays(8, seed=3)
    single = Predictor(params, cfg, batch_size=8, quantize="static",
                       tome_r=2)
    dp = Predictor(params, cfg, batch_size=8, quantize="static",
                   data_parallel=4, tome_r=2)
    a = single.predict_arrays(grays)
    b = dp.predict_arrays(grays)
    np.testing.assert_allclose(b.logits, a.logits, rtol=1e-4, atol=1e-4)
