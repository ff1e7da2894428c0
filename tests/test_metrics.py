"""Metric tests against sklearn oracles (SURVEY §7 hard part 4: on-device
sort-based AUC with sklearn tie/NaN semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chestxray_vit_tpu.eval import metrics as M

sk_metrics = pytest.importorskip("sklearn.metrics")


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_auroc_matches_sklearn(rng):
    n, c = 257, 15
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.3).astype(np.int64)
    ours = np.asarray(M.auroc_per_class(jnp.asarray(logits),
                                        jnp.asarray(labels)))
    for i in range(c):
        ref = sk_metrics.roc_auc_score(labels[:, i], _sigmoid(logits[:, i]))
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_auroc_with_heavy_ties(rng):
    # quantize scores to force ties — midrank handling must match sklearn
    n = 200
    scores = np.round(rng.standard_normal(n), 1).astype(np.float32)
    labels = (rng.random(n) < 0.4).astype(np.int64)
    ours = float(np.asarray(M.auroc_per_class(
        jnp.asarray(scores[:, None]), jnp.asarray(labels[:, None])))[0])
    ref = sk_metrics.roc_auc_score(labels, scores)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_degenerate_class_nan_and_avg(rng):
    logits = rng.standard_normal((50, 3)).astype(np.float32)
    labels = np.zeros((50, 3), np.int64)
    labels[:, 0] = (rng.random(50) < 0.5).astype(np.int64)
    labels[:, 1] = 1  # constant → NaN
    per = np.asarray(M.auroc_per_class(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    assert np.isnan(per[1]) and np.isnan(per[2])
    ref = sk_metrics.roc_auc_score(labels[:, 0], _sigmoid(logits[:, 0]))
    avg = float(np.asarray(M.avg_auroc(jnp.asarray(logits),
                                       jnp.asarray(labels))))
    np.testing.assert_allclose(avg, ref, atol=1e-5)
    # all degenerate → 0.0 (pyc L349-L353)
    all_deg = np.zeros((50, 2), np.int64)
    assert float(np.asarray(M.avg_auroc(jnp.asarray(logits[:, :2]),
                                        jnp.asarray(all_deg)))) == 0.0


def test_f1_micro_matches_sklearn(rng):
    n, c = 128, 15
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.25).astype(np.int64)
    pred = (_sigmoid(logits) >= 0.5).astype(np.int64)
    ref = sk_metrics.f1_score(labels, pred, average="micro", zero_division=0)
    ours = float(np.asarray(M.f1_micro(jnp.asarray(logits),
                                       jnp.asarray(labels))))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_f1_zero_division():
    logits = -10.0 * np.ones((4, 3), np.float32)  # no positive predictions
    labels = np.zeros((4, 3), np.int64)
    assert float(np.asarray(M.f1_micro(jnp.asarray(logits),
                                       jnp.asarray(labels)))) == 0.0


def test_per_class_prf_matches_sklearn(rng):
    n, c = 64, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.4).astype(np.int64)
    pred = (_sigmoid(logits) >= 0.5).astype(np.int64)
    p, r, f1, sup = (np.asarray(x) for x in
                     M.precision_recall_f1_per_class(jnp.asarray(logits),
                                                     jnp.asarray(labels)))
    rp, rr, rf, rs = sk_metrics.precision_recall_fscore_support(
        labels, pred, zero_division=0)
    np.testing.assert_allclose(p, rp, atol=1e-6)
    np.testing.assert_allclose(r, rr, atol=1e-6)
    np.testing.assert_allclose(f1, rf, atol=1e-6)
    np.testing.assert_array_equal(sup.astype(int), rs)


def test_classification_report_numbers_match_sklearn(rng):
    n, c = 64, 4
    names = ["Atelectasis", "Cardiomegaly", "Effusion", "No Finding"]
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.4).astype(np.int64)
    pred = (_sigmoid(logits) >= 0.5).astype(np.int64)
    ours = M.classification_report(logits, labels, names)
    ref = sk_metrics.classification_report(labels, pred, target_names=names,
                                           zero_division=0)
    # compare every numeric cell (text layout may differ in whitespace)
    ours_nums = [float(t) for t in ours.split() if _is_float(t)]
    ref_nums = [float(t) for t in ref.split() if _is_float(t)]
    np.testing.assert_allclose(ours_nums, ref_nums, atol=5e-3)


def _is_float(tok):
    try:
        float(tok)
        return True
    except ValueError:
        return False


def test_compute_metrics_bundle(rng):
    logits = rng.standard_normal((40, 3)).astype(np.float32)
    labels = (rng.random((40, 3)) < 0.5).astype(np.int64)
    out = M.compute_metrics(logits, labels, ["A", "B", "C"])
    assert {"avg_auroc", "f1_micro", "auroc_A", "auroc_B", "auroc_C"} <= set(out)
    assert 0.0 <= out["avg_auroc"] <= 1.0
