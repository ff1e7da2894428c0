"""Per-class threshold calibration: exact-sweep optimality vs brute force,
sklearn F1 agreement at the chosen thresholds, and the Trainer.predict
integration (calibrate on val, apply to test, never touch test labels)."""

import numpy as np
import pytest

from chestxray_vit_tpu.eval import metrics as M


def _synthetic(n=400, c=6, seed=0):
    """Miscalibrated multi-label scores: per-class logit offsets push the
    optimal threshold away from 0.5."""
    rng = np.random.default_rng(seed)
    labels = (rng.random((n, c)) < rng.uniform(0.05, 0.5, c)).astype(
        np.float32)
    offsets = rng.uniform(-3.0, 1.0, c)
    logits = (labels * 2.0 + rng.standard_normal((n, c))
              + offsets).astype(np.float32)
    return logits, labels


def test_calibration_is_optimal_vs_brute_force():
    from sklearn.metrics import f1_score
    logits, labels = _synthetic()
    probs = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    th = M.calibrate_thresholds(logits, labels)
    for j in range(labels.shape[1]):
        best = f1_score(labels[:, j], probs[:, j] >= th[j],
                        zero_division=0)
        # brute force over all candidate cuts
        for cand in np.unique(probs[:, j]):
            alt = f1_score(labels[:, j], probs[:, j] >= cand,
                           zero_division=0)
            assert best >= alt - 1e-12, (j, cand, alt, best)


def test_calibration_optimal_under_ties():
    """Tied probabilities: a cut inside a tie block is NOT realizable by a
    threshold (the midpoint degenerates to the tied value and `>=` takes
    the whole block). Regression: probs [0.8, 0.2, 0.6, 0.8, 0.8] /
    labels [1,0,1,0,0] used to return 0.8 (realized F1 0.4, worse than
    the 0.5 default); the realizable optimum includes the 0.6 sample
    (0.2 < th <= 0.6, F1 2/3)."""
    from sklearn.metrics import f1_score
    probs = np.array([0.8, 0.2, 0.6, 0.8, 0.8])
    labels = np.array([1.0, 0.0, 1.0, 0.0, 0.0])[:, None]
    logits = np.log(probs / (1 - probs))[:, None]
    th = M.calibrate_thresholds(logits, labels)
    got = f1_score(labels[:, 0], probs >= th[0], zero_division=0)
    for cand in np.unique(probs):
        alt = f1_score(labels[:, 0], probs >= cand, zero_division=0)
        assert got >= alt - 1e-12, (cand, alt, got)
    assert 0.2 < th[0] <= 0.6 and abs(got - 2.0 / 3.0) < 1e-12


def test_calibration_saturated_logits():
    """f64 sigmoid rounds to exactly 1.0 for logits ≳ 37 — confident
    models produce tied blocks at 1.0; the sweep must stay realizable."""
    from sklearn.metrics import f1_score
    logits = np.array([50.0, 60.0, 70.0, -50.0, 2.0, 1.0])[:, None]
    labels = np.array([1.0, 1.0, 0.0, 0.0, 1.0, 0.0])[:, None]
    probs = 1.0 / (1.0 + np.exp(-logits[:, 0].astype(np.float64)))
    assert (probs == 1.0).sum() == 3                  # the tie is real
    th = M.calibrate_thresholds(logits, labels)
    got = f1_score(labels[:, 0], probs >= th[0], zero_division=0)
    for cand in np.unique(probs):
        alt = f1_score(labels[:, 0], probs >= cand, zero_division=0)
        assert got >= alt - 1e-12, (cand, alt, got)


def test_calibration_beats_half_on_miscalibrated_scores():
    logits, labels = _synthetic(seed=3)
    th = M.calibrate_thresholds(logits, labels)
    assert M.f1_micro_at(logits, labels, th) > M.f1_micro_at(
        logits, labels, 0.5)


def test_degenerate_class_keeps_half():
    logits, labels = _synthetic(c=3, seed=1)
    labels[:, 1] = 0.0                    # no positives
    th = M.calibrate_thresholds(logits, labels)
    assert th[1] == 0.5


def test_report_accepts_per_class_thresholds(tmp_path):
    from sklearn.metrics import f1_score
    logits, labels = _synthetic(c=4, seed=2)
    th = M.calibrate_thresholds(logits, labels)
    names = [f"c{i}" for i in range(4)]
    text = M.write_classification_report(
        str(tmp_path / "r.txt"), logits, labels.astype(np.int64), names,
        th)
    assert "calibrated per-class thresholds" in text
    # the report's micro row must match sklearn at the same thresholds
    probs = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    want = f1_score(labels, (probs >= th).astype(int), average="micro",
                    zero_division=0)
    got = M.f1_micro_at(logits, labels, th)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_trainer_predict_calibrate(tmp_path):
    from chestxray_vit_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig)
    from chestxray_vit_tpu.data.testing import build_fake_nih
    from chestxray_vit_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=32,
                          num_layers=1, num_heads=2, mlp_dim=64,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(output_dir=str(tmp_path / "out"),
                          report_to="none"))
    fake = build_fake_nih(num_images=50, image_size=64, seed=4)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    logits, labels, metrics = tr.predict(
        report_path=str(tmp_path / "report.txt"), calibrate=True)
    assert "f1_micro_calibrated" in metrics
    assert 0.0 <= metrics["f1_micro_calibrated"] <= 1.0
    assert "calibrated per-class thresholds" in open(
        tmp_path / "report.txt").read()
    tr.close()
