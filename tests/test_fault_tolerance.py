"""Fault-tolerance beyond the reference (SURVEY §5 'a dead worker kills the
job'): transient-storage retry and preemption-safe checkpointing."""

import threading
import time

import numpy as np
import pytest

from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.data.storage import MemoryStore, RetryingStore
from chestxray_vit_tpu.data.testing import build_fake_nih
from chestxray_vit_tpu.train.trainer import Trainer


class FlakyStore:
    """Fails the first N calls per name with a transient error."""

    def __init__(self, inner, failures: int = 2):
        self.inner = inner
        self.failures = failures
        self.calls = {}

    def get(self, name):
        n = self.calls.get(name, 0)
        self.calls[name] = n + 1
        if n < self.failures:
            raise ConnectionError(f"transient #{n}")
        return self.inner.get(name)

    def list(self, prefix):
        return self.inner.list(prefix)

    def exists(self, name):
        return self.inner.exists(name)


def test_retrying_store_retries_transient_errors():
    inner = MemoryStore({"a": b"payload"})
    flaky = FlakyStore(inner, failures=2)
    store = RetryingStore(flaky, retries=3, base_delay=0.0)
    assert store.get("a") == b"payload"
    assert flaky.calls["a"] == 3            # 2 failures + 1 success


def test_retrying_store_does_not_retry_missing_blobs():
    inner = MemoryStore({})
    calls = {"n": 0}

    class Counting:
        def get(self, name):
            calls["n"] += 1
            return inner.get(name)          # KeyError

        list = inner.list
        exists = inner.exists

    store = RetryingStore(Counting(), retries=3, base_delay=0.0)
    with pytest.raises(KeyError):
        store.get("missing")
    assert calls["n"] == 1                  # not retried


def test_retrying_store_exhausts_and_raises():
    flaky = FlakyStore(MemoryStore({"a": b"x"}), failures=99)
    store = RetryingStore(flaky, retries=2, base_delay=0.0)
    with pytest.raises(ConnectionError):
        store.get("a")
    assert flaky.calls["a"] == 3            # initial + 2 retries


def _cfg(tmp_path):
    return Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=2e-3,
                          max_steps=10_000, num_epochs=1000,
                          eval_strategy="no", save_strategy="steps",
                          save_steps=10_000, logging_steps=1000,
                          load_best_model_at_end=False,
                          output_dir=str(tmp_path / "out"),
                          report_to="none", seed=0))


def test_preemption_checkpoints_and_resumes(tmp_path):
    """request_stop() (what the SIGTERM handler calls) checkpoints the
    exact cursor and exits cleanly; auto-resume continues from it."""
    fake = build_fake_nih(num_images=80, image_size=64, seed=11)
    cfg = _cfg(tmp_path)
    tr = Trainer(cfg, store=fake.store, pretrained=False)

    stopper = threading.Timer(1.0, tr.request_stop)
    stopper.start()
    t0 = time.time()
    tr.train()
    stopper.cancel()
    assert time.time() - t0 < 120           # did not run the full 10k steps
    stopped_at = int(tr.state.step)
    assert 0 < stopped_at < 10_000
    tr.ckpt.wait()
    assert tr.ckpt.latest_step() == stopped_at
    tr.close()

    cfg2 = _cfg(tmp_path)
    cfg2.train.max_steps = stopped_at + 2
    cfg2.train.resume_from_checkpoint = "auto"
    tr2 = Trainer(cfg2, store=fake.store, pretrained=False)
    tr2.train()
    assert int(tr2.state.step) == stopped_at + 2
    tr2.close()


def test_sigterm_handler_requests_stop(tmp_path):
    """The installed SIGTERM handler routes to request_stop (direct handler
    invocation — raising real signals inside pytest is unreliable)."""
    import signal

    fake = build_fake_nih(num_images=40, image_size=64, seed=3)
    cfg = _cfg(tmp_path)
    cfg.train.max_steps = 2
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    restore = tr._install_preemption_handler()
    try:
        handler = signal.getsignal(signal.SIGTERM)
        assert callable(handler)
        tr._stop_requested = False
        handler(signal.SIGTERM, None)
        assert tr._stop_requested
    finally:
        restore()
        tr.close()


def test_nan_guard_raises_at_sync_point(tmp_path):
    """Divergence guard: a non-finite loss surfacing at a sync point
    raises immediately with the step number instead of training on."""
    fake = build_fake_nih(num_images=40, image_size=64, seed=2)
    cfg = _cfg(tmp_path)
    cfg.train.max_steps = 6
    cfg.train.logging_steps = 2           # sync cadence = 2
    tr = Trainer(cfg, store=fake.store, pretrained=False)

    real_step = tr._train_step
    calls = {"n": 0}

    def poisoned(state, batch):
        state, metrics = real_step(state, batch)
        calls["n"] += 1
        if calls["n"] >= 3:
            metrics = dict(metrics)
            metrics["loss"] = metrics["loss"] * float("nan")
        return state, metrics

    tr._train_step = poisoned
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.train()
    tr.close()

    # guard off: the same poison trains to completion
    cfg2 = _cfg(tmp_path)
    cfg2.train.max_steps = 6
    cfg2.train.logging_steps = 2
    cfg2.train.nan_guard = "off"
    cfg2.train.output_dir = str(tmp_path / "out2")
    tr2 = Trainer(cfg2, store=fake.store, pretrained=False)
    real2 = tr2._train_step

    def poisoned2(state, batch):
        state, metrics = real2(state, batch)
        metrics = dict(metrics)
        metrics["loss"] = metrics["loss"] * float("nan")
        return state, metrics

    tr2._train_step = poisoned2
    tr2.train()                            # no raise
    assert int(tr2.state.step) == 6
    tr2.close()
