"""Flash-attention kernel tests against the XLA oracle (interpret mode on
CPU; the same kernel compiles on TPU). SURVEY.md §7 hard part 2: correctness
at non-power-of-two sequence lengths (577/1025) via padding + masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chestxray_vit_tpu.ops.flash_attention import (
    attention,
    attention_xla,
    flash_attention,
)


def _qkv(rng, b=1, h=2, s=137, d=64, dtype=jnp.float32):
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
               for _ in range(3))
    return q, k, v


@pytest.mark.parametrize("s", [64, 128, 137, 256])
def test_forward_matches_xla(rng, s):
    q, k, v = _qkv(rng, s=s)
    out = flash_attention(q, k, v)
    ref = attention_xla(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_nonsquare_blocks_vit_like(rng):
    # 577-token-style odd length, scaled down for interpreter speed
    q, k, v = _qkv(rng, b=2, h=3, s=129, d=64)
    out = flash_attention(q, k, v, None, 128)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_xla(rng):
    q, k, v = _qkv(rng, b=1, h=2, s=130, d=64)
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * g)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * g)

    dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)


def test_bf16_inputs_f32_math(rng):
    q, k, v = _qkv(rng, s=96, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = attention_xla(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("block_bh", [1, 2, 3, 8, 64])
def test_block_bh_variants_match_xla(rng, block_bh):
    """The (batch·head)-blocked grid must be numerically identical for any
    block_bh (including non-divisors, which clamp to the largest divisor)."""
    q, k, v = _qkv(rng, b=2, h=3, s=130, d=64)   # BH = 6
    out = flash_attention(q, k, v, None, 128, block_bh)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    dq, dk, dv = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v, None, 128,
                                                block_bh) * g),
        argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(
        lambda q, k, v: jnp.sum(attention_xla(q, k, v) * g),
        argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_uses_xla_on_cpu(rng):
    q, k, v = _qkv(rng, s=64)
    np.testing.assert_allclose(np.asarray(attention(q, k, v, impl="auto")),
                               np.asarray(attention_xla(q, k, v)),
                               atol=1e-6)


def test_jit_and_grad_under_jit(rng):
    q, k, v = _qkv(rng, s=100)

    @jax.jit
    def f(q, k, v):
        return jax.grad(lambda q: jnp.sum(flash_attention(q, k, v)))(q)

    out = f(q, k, v)
    assert out.shape == q.shape and bool(jnp.isfinite(out).all())


def test_strongly_negative_scores_with_padding(rng):
    """Regression: when every VALID score in a row is strongly negative,
    the zero-padded K columns must not win the softmax max — without the
    fused -1e6 pad bias, m = 0 made all valid p underflow (l = 0 → NaN
    output) while the XLA oracle stayed finite. Covers fwd AND bwd (an
    unmasked bwd pad column's p = exp(-lse) overflows once lse is anchored
    to the valid max)."""
    s, d = 130, 8                 # 130 → S_pad 256: real pad columns
    q = jnp.full((1, 1, s, d), 10.0, jnp.float32)
    k = jnp.full((1, 1, s, d), -10.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, s, d)), jnp.float32)

    out = flash_attention(q, k, v)
    ref = attention_xla(q, k, v)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_xla(q, k, v) ** 2).sum()

    # perturb q so scores aren't perfectly uniform (grads non-trivial)
    q = q + jnp.asarray(rng.standard_normal(q.shape) * 0.1, jnp.float32)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
