"""REAL multi-process trainer test: two jax.distributed processes (4 CPU
devices each, 8 global) drive Trainer.train()+evaluate() through the
multi-host code path — host-sliced decode, host_local_array_to_global_array
batch formation, cross-process eval gather — and must reproduce the
single-process run's losses and metrics exactly (the augmentation RNG keys
on global in-batch position, so the data streams are identical)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.data.testing import build_fake_nih
from chestxray_vit_tpu.train.trainer import Trainer

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    results = []
    for pid in (0, 1):
        with open(os.path.join(outdir, f"result_rank{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_two_process_training_runs_and_agrees(multihost_results):
    r0, r1 = multihost_results
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert len(r0["losses"]) == 4
    # replicated metrics: both processes observed the same losses
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["eval"]["avg_auroc"],
                               r1["eval"]["avg_auroc"], rtol=1e-6)


def test_two_process_matches_single_process(multihost_results, tmp_path):
    """The multi-host path is an implementation detail: losses and eval
    metrics must match a single-process run of the identical config on the
    same 8-device mesh."""
    cfg = Config(
        data=DataConfig(backend="memory", augment=True),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=2e-3,
                          max_steps=4, eval_strategy="no",
                          save_strategy="steps", save_steps=10_000,
                          load_best_model_at_end=False, logging_steps=1,
                          output_dir=str(tmp_path / "single"),
                          report_to="none", seed=0),
    )
    fake = build_fake_nih(num_images=80, image_size=64, seed=11)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    tr.train()
    ev = tr.evaluate()
    tr.close()

    losses = []
    with open(tmp_path / "single" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "train":
                losses.append(rec["loss"])

    r0 = multihost_results[0]
    np.testing.assert_allclose(r0["losses"], losses, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(r0["eval"]["avg_auroc"], ev["avg_auroc"],
                               rtol=1e-5)
    np.testing.assert_allclose(r0["eval"]["eval_loss"], ev["eval_loss"],
                               rtol=2e-5, atol=1e-6)
