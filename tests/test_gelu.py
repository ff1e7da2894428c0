"""Fast exact-erf GELU vs the lax.erf and torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.ops.gelu import erf_fast, gelu


def test_erf_fast_accuracy():
    x = jnp.asarray(np.linspace(-8, 8, 200001), jnp.float32)
    err = float(jnp.max(jnp.abs(erf_fast(x) - jax.lax.erf(x))))
    assert err < 5e-6
    # odd symmetry and saturation
    np.testing.assert_allclose(np.asarray(erf_fast(-x)),
                               -np.asarray(erf_fast(x)), atol=1e-7)
    assert float(erf_fast(jnp.asarray(10.0))) == 1.0


def test_gelu_matches_torch_exact():
    torch = pytest.importorskip("torch")
    x = np.linspace(-6, 6, 10001).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_gelu_grad_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-4, 4, 2001).astype(np.float32)
    ours = np.asarray(jax.vmap(jax.grad(
        lambda v: gelu(v)))(jnp.asarray(x)))
    xt = torch.from_numpy(x).requires_grad_(True)
    torch.nn.functional.gelu(xt).sum().backward()
    np.testing.assert_allclose(ours, xt.grad.numpy(), atol=5e-5)


def test_gelu_bf16_and_approximate():
    x = jnp.asarray(np.linspace(-3, 3, 101), jnp.bfloat16)
    exact = gelu(x)
    assert exact.dtype == jnp.bfloat16
    approx = gelu(x, approximate=True)
    assert not np.array_equal(np.asarray(exact, np.float32),
                              np.asarray(approx, np.float32))
