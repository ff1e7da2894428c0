"""Checkpoint/resume tests: async save, retention, best tracking, exact
state roundtrip (SURVEY §7 step 7; §5 'single logical checkpoint')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.config import Config, ModelConfig, TrainConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.train import checkpoint as C
from chestxray_vit_tpu.train import steps as S


def _tiny_state(seed=0):
    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                      num_layers=2, num_heads=4, mlp_dim=128, num_classes=5,
                      dtype="float32")
    params = vit.init_params(jax.random.key(seed), cfg)
    return S.TrainState.create(params, seed), cfg


def test_save_restore_roundtrip(tmp_path):
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"), save_total_limit=2)
    mgr.save(1, state, cursor=C.DataCursor(epoch=2, batch_in_epoch=7),
             metrics={"avg_auroc": 0.5})
    mgr.wait()
    template, _ = _tiny_state(seed=99)  # different values, same structure
    restored, cursor, _ = mgr.restore(1, template)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    assert (cursor.epoch, cursor.batch_in_epoch) == (2, 7)
    # rng restores to an equivalent key
    a = jax.random.uniform(restored.rng)
    b = jax.random.uniform(state.rng)
    assert float(a) == float(b)
    mgr.close()


def test_retention_and_best(tmp_path):
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"), save_total_limit=2,
                              metric_for_best="avg_auroc")
    for step, auc in [(1, 0.6), (2, 0.9), (3, 0.7), (4, 0.5)]:
        st = S.TrainState(step=jnp.asarray(step, jnp.int32),
                          params=state.params, opt_state=state.opt_state,
                          rng=state.rng)
        mgr.save(step, st, metrics={"avg_auroc": auc})
    mgr.wait()
    assert mgr.best_step() == 2          # highest avg_auroc survives
    assert len(list(mgr.all_steps())) <= 3
    restored, _, _ = mgr.restore(mgr.best_step(), state)
    assert int(restored.step) == 2
    mgr.close()


def test_restore_latest_and_missing(tmp_path):
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(None, state)
    mgr.save(5, state)
    mgr.wait()
    assert mgr.latest_step() == 5
    restored, _, _ = mgr.restore(None, state)
    assert int(restored.step) == int(state.step)
    mgr.close()


def test_save_model_load_model(tmp_path):
    state, cfg = _tiny_state()
    d = str(tmp_path / "model")
    C.save_model(d, state.params, Config().to_json(), ["A", "B"])
    params, classes = C.load_model(d, state.params)
    assert classes == ["A", "B"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_retention_preserves_latest(tmp_path):
    """Regression: Orbax's default BestN-only policy deleted a freshly
    written non-best checkpoint immediately, so a crash rolled resume back
    to an older best. Retention must keep the latest PLUS the best N."""
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"), save_total_limit=2,
                              metric_for_best="avg_auroc")
    for step, auc in [(1, 0.80), (2, 0.84), (3, 0.83), (4, 0.82)]:
        mgr.save(step, state, metrics={"avg_auroc": auc})
        mgr.wait()
    kept = set(mgr.all_steps())
    assert 4 in kept, "latest checkpoint must survive retention"
    assert mgr.latest_step() == 4
    assert {2, 3} <= kept                # the two best by avg_auroc
    assert mgr.best_step() == 2
    mgr.close()


def test_metricless_saves_stay_bounded(tmp_path):
    """Regression: with best tracking on but metrics absent (save cadence
    not aligned with eval), keep_checkpoints_without_metrics=True kept
    every checkpoint forever. Metrics-less saves must be bounded."""
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"), save_total_limit=2,
                              metric_for_best="avg_auroc")
    for step in range(1, 7):
        mgr.save(step, state)            # no metrics at all
        mgr.wait()
    assert len(list(mgr.all_steps())) <= 2
    assert mgr.latest_step() == 6
    mgr.close()


def test_metrics_missing_best_key_is_safe(tmp_path):
    """A metrics dict lacking metric_for_best (e.g. its value was NaN and
    got cleaned) must rank as worst, not KeyError inside retention."""
    state, _ = _tiny_state()
    mgr = C.CheckpointManager(str(tmp_path / "ck"), save_total_limit=2,
                              metric_for_best="avg_auroc")
    mgr.save(1, state, metrics={"avg_auroc": 0.9})
    mgr.wait()
    for step in (2, 3, 4):
        mgr.save(step, state, metrics={"eval_loss": 0.5,
                                       "avg_auroc": float("nan")})
        mgr.wait()
    kept = set(mgr.all_steps())
    assert 1 in kept                      # the only real best survives
    assert mgr.best_step() == 1
    assert mgr.latest_step() == 4
    mgr.close()
