"""Token merging oracles: the jnp matching/merge vs an independent numpy
reference, structural invariants (CLS protection/position, static
shapes, size conservation), and the lossless-duplicates property —
merging exact-duplicate tokens must not change a size-weighted mean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chestxray_vit_tpu.ops.tome import (
    bipartite_soft_matching,
    merge_tokens,
    tome_merge,
)


def _np_reference(metric, x, sizes, r):
    """Straightforward numpy restatement of the algorithm."""
    bsz, s, _ = metric.shape
    outs, out_sizes = [], []
    for i in range(bsz):
        m = metric[i].astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
        a_idx = np.arange(0, s, 2)
        b_idx = np.arange(1, s, 2)
        scores = m[a_idx] @ m[b_idx].T
        scores[0, :] = -1e30                      # protect CLS
        node_max = scores.max(-1)
        node_arg = scores.argmax(-1)
        order = np.argsort(-node_max, kind="stable")
        src = order[:r]
        unm = np.sort(order[r:])
        xa, xb = x[i, 0::2].astype(np.float64), x[i, 1::2].astype(np.float64)
        sa, sb = sizes[i, 0::2].copy(), sizes[i, 1::2].copy()
        num = xb * sb[:, None]
        den = sb.copy()
        for k in range(r):
            d = node_arg[src[k]]
            num[d] += xa[src[k]] * sa[src[k]]
            den[d] += sa[src[k]]
        xb = num / den[:, None]
        outs.append(np.concatenate([xa[unm], xb], 0))
        out_sizes.append(np.concatenate([sa[unm], den], 0))
    return np.stack(outs), np.stack(out_sizes)


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    b, s, d, r = 3, 21, 8, 6
    metric = rng.standard_normal((b, s, d)).astype(np.float32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    sizes = rng.integers(1, 4, (b, s)).astype(np.float32)
    got_x, got_s = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                              jnp.asarray(sizes), r)
    ref_x, ref_s = _np_reference(metric, x, sizes, r)
    assert got_x.shape == (b, s - r, d)
    np.testing.assert_allclose(np.asarray(got_x), ref_x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, atol=1e-5)


def test_cls_protected_and_first():
    rng = np.random.default_rng(1)
    b, s, d, r = 2, 17, 8, 5
    metric = rng.standard_normal((b, s, d)).astype(np.float32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    x[:, 0] = 123.0                               # tag the CLS token
    out, _ = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                        jnp.ones((b, s), jnp.float32), r)
    np.testing.assert_allclose(np.asarray(out)[:, 0], 123.0)


def test_size_conservation():
    rng = np.random.default_rng(2)
    b, s, d, r = 2, 33, 16, 9
    metric = rng.standard_normal((b, s, d)).astype(np.float32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    sizes = rng.integers(1, 5, (b, s)).astype(np.float32)
    _, out_sizes = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                              jnp.asarray(sizes), r)
    np.testing.assert_allclose(np.asarray(out_sizes).sum(-1),
                               sizes.sum(-1), rtol=1e-6)


def test_duplicates_merge_losslessly():
    """If token t (even) duplicates token u (odd) exactly — same metric,
    same value, size 1 each — merging t into u yields mean(t,u) = the
    duplicated value with size 2: the weighted token population is
    unchanged."""
    rng = np.random.default_rng(3)
    b, s, d = 1, 11, 8
    metric = rng.standard_normal((b, s, d)).astype(np.float32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    metric[0, 2] = metric[0, 3]                   # A-token 1 ≡ B-token 1
    x[0, 2] = x[0, 3]
    out, sizes = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                            jnp.ones((b, s), jnp.float32), 1)
    out, sizes = np.asarray(out), np.asarray(sizes)
    # the duplicate pair merged: its value survives bit-meaningfully and
    # carries size 2; every other token survives with size 1
    merged_rows = np.isclose(out[0], x[0, 3], atol=1e-6).all(-1)
    assert merged_rows.sum() == 1
    assert sizes[0][merged_rows] == 2.0
    assert (np.sort(sizes[0])[:-1] == 1.0).all()


def test_fused_equals_composition():
    """tome_merge's fused top_k/cumsum path ≡ merge_tokens applied to
    bipartite_soft_matching's indices."""
    rng = np.random.default_rng(5)
    b, s, d, r = 3, 29, 8, 7
    metric = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    sizes = jnp.asarray(rng.integers(1, 4, (b, s)), jnp.float32)
    fast_x, fast_s = tome_merge(x, metric, sizes, r)
    ref_x, ref_s = merge_tokens(x, sizes,
                                *bipartite_soft_matching(metric, r))
    np.testing.assert_allclose(np.asarray(fast_x), np.asarray(ref_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast_s), np.asarray(ref_s))


def test_r_bounds_rejected():
    metric = jnp.zeros((1, 9, 4))
    with pytest.raises(ValueError, match="r="):
        bipartite_soft_matching(metric, 0)
    with pytest.raises(ValueError, match="r="):
        bipartite_soft_matching(metric, 5)        # |A| = 5 → max r = 4


def test_static_shapes_under_jit():
    rng = np.random.default_rng(4)
    b, s, d, r = 2, 13, 8, 3
    f = jax.jit(lambda x, m, z: tome_merge(x, m, z, r))
    out, sizes = f(jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32),
                   jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32),
                   jnp.ones((b, s), jnp.float32))
    assert out.shape == (b, s - r, d) and sizes.shape == (b, s - r)


def test_bf16_merge_tracks_f32():
    """Production dtype: the bf16 routing matmul (f32 accumulation)
    tracks the f32 merge within bf16 rounding."""
    rng = np.random.default_rng(6)
    b, s, d, r = 2, 25, 16, 6
    metric = rng.standard_normal((b, s, d)).astype(np.float32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    sizes = np.ones((b, s), np.float32)
    ref_x, ref_s = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                              jnp.asarray(sizes), r)
    out_x, out_s = tome_merge(jnp.asarray(x, jnp.bfloat16),
                              jnp.asarray(metric, jnp.bfloat16),
                              jnp.asarray(sizes), r)
    assert out_x.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.float32(out_x), np.asarray(ref_x),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s))
    # sizes stay exact f32 even in the bf16 path (counts > 256 would
    # round in bf16)
    big = np.full((b, s), 300.0, np.float32)
    _, big_s = tome_merge(jnp.asarray(x, jnp.bfloat16),
                          jnp.asarray(metric, jnp.bfloat16),
                          jnp.asarray(big), r)
    assert float(np.asarray(big_s).sum()) == 300.0 * s * b


def test_r_schedule():
    """Per-layer budget distribution: constant replicates r; decreasing
    preserves the exact r·L total, never increases with depth, and
    front-loads (first layer gets ~2r)."""
    from chestxray_vit_tpu.ops.tome import r_schedule

    assert r_schedule(16, 12, "constant") == (16,) * 12
    for r, L in [(16, 12), (32, 24), (8, 3), (5, 1), (1, 12)]:
        rs = r_schedule(r, L, "decreasing")
        assert len(rs) == L
        assert sum(rs) == r * L                   # same merged total
        assert all(a >= b for a, b in zip(rs, rs[1:]))  # non-increasing
        assert rs[0] >= r                         # front-loaded
    # L=1 degenerates to constant
    assert r_schedule(7, 1, "decreasing") == (7,)
    with pytest.raises(ValueError):
        r_schedule(16, 12, "linear")
    with pytest.raises(ValueError):
        r_schedule(-1, 12)
