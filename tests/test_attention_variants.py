"""Fused-QKV projection and the forward-only inference kernel: both are
pure perf variants and must be numerically invisible."""

import jax
import jax.numpy as jnp
import numpy as np

from chestxray_vit_tpu.config import ModelConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.ops import flash_attention as fa


def _cfg(**kw):
    return ModelConfig(img_size=32, patch_size=16, hidden_size=32,
                       num_layers=2, num_heads=2, mlp_dim=64, num_classes=4,
                       dtype="float32", attention_impl="xla", **kw)


def test_fused_qkv_matches_split_projections():
    cfg0, cfg1 = _cfg(), _cfg(fused_qkv=True)
    params = vit.init_params(jax.random.key(0), cfg0)
    images = jax.random.normal(jax.random.key(1), (3, 32, 32, 3))
    a = vit.apply(params, images, cfg0)
    b = vit.apply(params, images, cfg1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)

    def loss(p, cfg):
        return jnp.sum(vit.apply(p, images, cfg) ** 2)

    g0 = jax.grad(loss)(params, cfg0)
    g1 = jax.grad(loss)(params, cfg1)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_inference_kernel_matches_training_kernel():
    ks = jax.random.split(jax.random.key(3), 3)
    q, k, v = (jax.random.normal(kk, (2, 3, 77, 64)) for kk in ks)
    a = fa.flash_attention_inference(q, k, v)
    b = fa.flash_attention(q, k, v)
    c = fa.attention_xla(q, k, v)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               atol=1e-5, rtol=1e-5)


def test_inference_kernel_multi_block():
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 300, 64)) for kk in ks)
    a = fa.flash_attention_inference(q, k, v, None, 128)
    c = fa.attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               atol=1e-5, rtol=1e-5)
