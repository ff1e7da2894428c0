"""Oracle tests for the fused Mosaic int8 matmul (ops/int8_pallas.py)
and the backend="pallas" static-quantized forward.

The kernel's int8×int8→int32 contraction is exact, so kernel-level
tests assert equality against numpy integer math (with the same f32
epilogue order); the full-model test pins the pallas backend against
the XLA static path, whose fidelity is itself pinned in
tests/test_quant.py. Measured on chip the backend is throughput-parity
with XLA (BENCH_NOTES "Round 3: Mosaic int8 integration") — it is kept
as the demonstrated fused-epilogue kernel path, not a speed default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chestxray_vit_tpu.config import ModelConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.models.quantized import (
    apply_quantized,
    calibrate_vit_scales,
    quantize_vit_params,
)
from chestxray_vit_tpu.ops.gelu import gelu
from chestxray_vit_tpu.ops.int8_pallas import (
    int8_matmul_fused,
    quantize_static,
)


def _operands(b=2, s=7, k=16, n=24, seed=0):
    rng = np.random.default_rng(seed)
    xq = jnp.asarray(rng.integers(-127, 128, (b, s, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    acc = jnp.einsum("bsk,kn->bsn", xq.astype(jnp.int32),
                     wq.astype(jnp.int32)).astype(jnp.float32)
    return xq, wq, scale, bias, acc


def test_plain_epilogue_exact():
    xq, wq, scale, bias, acc = _operands()
    ref = (acc * scale + bias).astype(jnp.bfloat16)
    out = int8_matmul_fused(xq, wq, scale, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.float32(ref), np.float32(out))


def test_residual_fused_exact():
    xq, wq, scale, bias, acc = _operands(seed=1)
    rng = np.random.default_rng(2)
    resid = jnp.asarray(rng.standard_normal(acc.shape), jnp.bfloat16)
    ref = (acc * scale + bias + np.float32(resid)).astype(jnp.bfloat16)
    out = int8_matmul_fused(xq, wq, scale, bias, resid=resid)
    np.testing.assert_array_equal(np.float32(ref), np.float32(out))


def test_gelu_requantize_exact():
    xq, wq, scale, bias, acc = _operands(seed=3)
    g = np.asarray(gelu((acc * scale + bias).astype(jnp.float32)))
    qs = 0.05
    ref = np.clip(np.round(g / qs), -127, 127).astype(np.int8)
    out = int8_matmul_fused(xq, wq, scale, bias, gelu=True,
                            out_quant_scale=jnp.float32(qs))
    assert out.dtype == jnp.int8
    np.testing.assert_array_equal(ref, np.asarray(out))


def test_quantize_static_matches_quant_py():
    from chestxray_vit_tpu.ops.quant import quantize_rows  # noqa: F401
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 5, 8)), jnp.float32)
    s = jnp.float32(0.02)
    ref = np.clip(np.round(np.asarray(x) / 0.02), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(ref, np.asarray(quantize_static(x, s)))


def _small_cfg():
    return ModelConfig(img_size=32, patch_size=8, hidden_size=64,
                       num_heads=4, num_layers=2, mlp_dim=128,
                       num_classes=5, remat=False)


def test_full_model_matches_xla_static():
    cfg = _small_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    scales = calibrate_vit_scales(params, x, cfg)
    qp = quantize_vit_params(params, scales)
    lx = apply_quantized(qp, x, cfg, backend="xla")
    lp = apply_quantized(qp, x, cfg, backend="pallas")
    # same int8 operands; only bf16-vs-f32 rounding order differs in the
    # GELU→requantize hop, so the logits agree tightly
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), atol=2e-2)
    lf = vit.apply(params, x, cfg)
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lp).ravel())[0, 1]
    assert corr > 0.999


def test_pallas_requires_static_scales():
    cfg = _small_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    qp = quantize_vit_params(params)                 # dynamic: no scales
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="static"):
        apply_quantized(qp, x, cfg, backend="pallas")


def test_pallas_rejects_tanh_gelu():
    cfg = _small_cfg()
    cfg.gelu_approximate = True
    params = vit.init_params(jax.random.key(0), cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    scales = calibrate_vit_scales(params, x, cfg)
    qp = quantize_vit_params(params, scales)
    with pytest.raises(ValueError, match="gelu"):
        apply_quantized(qp, x, cfg, backend="pallas")


def test_unknown_backend_rejected():
    cfg = _small_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    qp = quantize_vit_params(params)
    with pytest.raises(ValueError, match="backend"):
        apply_quantized(qp, x, cfg, backend="wat")
