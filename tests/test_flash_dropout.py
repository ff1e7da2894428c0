"""In-kernel attention dropout (dense + packed flash kernels), interpret
mode (CPU). Exactness strategy: the kernel's Bernoulli mask is a pure
counter hash of (abs_bh, q_row, col, seed) — independent of the kernel's
block decomposition — so tests recompute the exact mask in numpy and
compare output AND gradients against an XLA oracle with that fixed mask.

HF semantics under test (ViTSelfAttention: dropout on softmax
probabilities): o = (M ∘ softmax(QKᵀ·scale)) V / (1-rate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chestxray_vit_tpu.ops import flash_attention as fa

RATE = 0.3
SEED = jnp.asarray([12345], jnp.int32)


def _ref_keep(bh, q_pad, s_pad, seed, rate):
    """Numpy reimplementation of the kernel's counter-hash mask."""
    def fmix32(x):
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x85EBCA6B)
        x = x ^ (x >> np.uint32(13))
        x = x * np.uint32(0xC2B2AE35)
        return x ^ (x >> np.uint32(16))

    e = np.arange(bh, dtype=np.uint32)[:, None, None]
    i = np.arange(q_pad, dtype=np.uint32)[None, :, None]
    j = np.arange(s_pad, dtype=np.uint32)[None, None, :]
    with np.errstate(over="ignore"):
        counter = (e * np.uint32(q_pad) + i) * np.uint32(s_pad) + j
        bits = fmix32(counter ^ (np.uint32(seed) * np.uint32(0x9E3779B9)))
    threshold = np.uint32(min(int(rate * 2.0**32), 2**32 - 1))
    return bits >= threshold


def _rand(rng, shape):
    return jax.random.normal(rng, shape, jnp.float32)


def _qkv(seq=77, b=2, h=3, d=64, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(_rand(k, (b, h, seq, d)) for k in ks)


def _oracle(q, k, v, keep, rate):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    pd = jnp.where(keep, p, 0.0) / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", pd, v)


def _keep_for(q, rate=RATE, seed=int(SEED[0])):
    """The mask the kernel will use, sliced to the valid region."""
    b, h, s, d = q.shape
    q_pad, _ = fa._q_blocking(s, fa.DEFAULT_BLOCK_Q)
    s_pad = fa._pad_len(s, fa.DEFAULT_BLOCK_Q)
    keep = _ref_keep(b * h, q_pad, s_pad, seed, rate)
    return jnp.asarray(keep[:, :s, :s].reshape(b, h, s, s))


def test_forward_matches_oracle_with_exact_mask():
    q, k, v = _qkv()
    keep = _keep_for(q)
    got = fa.flash_attention_dropout(q, k, v, SEED, RATE)
    want = _oracle(q, k, v, keep, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_debug_variant_emits_the_actual_mask():
    q, k, v = _qkv(seed=3)
    o, keep_emitted = fa.flash_attention_dropout_debug(q, k, v, SEED, RATE)
    keep_ref = _keep_for(q)
    np.testing.assert_array_equal(np.asarray(keep_emitted) > 0.5,
                                  np.asarray(keep_ref))
    want = _oracle(q, k, v, keep_ref, RATE)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_oracle_with_exact_mask():
    q, k, v = _qkv(seed=7)
    keep = _keep_for(q)

    def loss_kernel(q, k, v):
        return jnp.sum(fa.flash_attention_dropout(q, k, v, SEED, RATE) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, keep, RATE) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_multi_block_backward_replays_the_same_mask():
    """Sequence longer than one Q block (the @512-style path): the bwd
    accumulation grid must regenerate the identical mask per block."""
    q, k, v = _qkv(seq=200, b=1, h=2, seed=11)
    block_q = 128          # forces a 2-block grid (q_pad 256)
    q_pad = fa._pad_len(200, block_q)
    s_pad = fa._pad_len(200, fa.DEFAULT_BLOCK_Q)
    keep = jnp.asarray(_ref_keep(2, q_pad, s_pad, int(SEED[0]),
                                 RATE)[:, :200, :200].reshape(1, 2, 200, 200))

    def loss_kernel(q, k, v):
        out = fa.flash_attention_dropout(q, k, v, SEED, RATE, None, block_q)
        return jnp.sum(out ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, keep, RATE) ** 2)

    np.testing.assert_allclose(float(loss_kernel(q, k, v)),
                               float(loss_oracle(q, k, v)), rtol=1e-5)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_keep_rate_statistics():
    q, _, _ = _qkv(seq=577, b=4, h=3)
    keep = np.asarray(_keep_for(q))
    assert abs(keep.mean() - (1.0 - RATE)) < 0.01


def test_seed_changes_mask_deterministically():
    q, k, v = _qkv(seed=5)
    a1 = fa.flash_attention_dropout(q, k, v, SEED, RATE)
    a2 = fa.flash_attention_dropout(q, k, v, SEED, RATE)
    b = fa.flash_attention_dropout(q, k, v, SEED + 1, RATE)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(b))


def test_packed_dropout_matches_oracle_with_exact_mask():
    b, h, s, d = 2, 2, 96, 32
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in ks)
    # two segments per sequence + pad tail
    seg = jnp.asarray(
        np.r_[np.zeros(40), np.ones(40), -np.ones(16)].astype(np.int32))
    seg = jnp.broadcast_to(seg, (b, s))
    block_q = 128
    s_pad = fa._pad_len(s, block_q)
    keep_full = _ref_keep(b * h, s_pad, s_pad, int(SEED[0]), RATE)
    keep = jnp.asarray(keep_full[:, :s, :s].reshape(b, h, s, s))

    got = fa.flash_attention_packed_dropout(q, k, v, seg, SEED, RATE)
    # pad rows (segment -1) see extra padded columns inside the kernel and
    # are never consumed downstream (pool_weights are zero there) — compare
    # and differentiate through VALID rows only
    valid = (seg >= 0)[:, None, :, None].astype(jnp.float32)

    def oracle(q, k, v):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        m = seg[:, None, :, None] == seg[:, None, None, :]
        p = jax.nn.softmax(jnp.where(m, sc, -1e30), axis=-1)
        pd = jnp.where(keep, p, 0.0) / (1.0 - RATE)
        return jnp.einsum("bhqk,bhkd->bhqd", pd, v)

    np.testing.assert_allclose(np.asarray(got * valid),
                               np.asarray(oracle(q, k, v) * valid),
                               atol=1e-5, rtol=1e-5)

    gk = jax.grad(lambda *a: jnp.sum(
        (fa.flash_attention_packed_dropout(*a, SEED, RATE) * valid) ** 2),
        argnums=(0, 1, 2))(q, k, v, seg)
    go = jax.grad(lambda q, k, v: jnp.sum((oracle(q, k, v) * valid) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_vit_train_step_with_attention_dropout_pallas():
    """vit.apply routes nonzero attention_dropout through the fused kernel
    when the Pallas impl is forced (interpret mode here); loss is finite
    and grads flow."""
    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit

    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64, num_classes=4,
                      attention_dropout=0.2, attention_impl="pallas",
                      dtype="float32")
    params = vit.init_params(jax.random.key(0), cfg)
    images = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))

    def loss(p):
        logits = vit.apply(p, images, cfg, train=True,
                           rng=jax.random.key(2))
        return jnp.sum(logits ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)
    # deterministic given the rng
    val2, _ = jax.value_and_grad(loss)(params)
    assert float(val) == float(val2)


def test_rate_zero_dispatch_unchanged():
    """attention_dropout=0 keeps the exact plain-kernel path (vit._mha
    routes to attention(); the dropout kernel is never built)."""
    q, k, v = _qkv(seed=9)
    plain = fa.flash_attention(q, k, v)
    xla = fa.attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(xla),
                               atol=1e-5, rtol=1e-5)
