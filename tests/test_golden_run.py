"""Fixed-seed golden-run regression (VERDICT r2 next #6a).

The oracle tests pin individual components; this pins the COMPOSITION: a
20-step deterministic fine-tune on the synthetic NIH bucket through the
full Trainer stack (metadata → split → decode → augment → sharded train
step → AdamW → eval metrics), f32 on the 8-device CPU mesh. Any silent
numerics drift — optimizer math, label engine ordering, augmentation RNG
discipline, sharding — moves the trajectory and fails here even when every
unit oracle still passes.

Golden values recorded 2026-08-17 (jax 0.9.0, CPU f32, seed 0). A small
tolerance absorbs reduction-order noise across XLA versions; a real drift
is orders of magnitude larger.
"""

import json

import numpy as np

from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.data.testing import build_fake_nih
from chestxray_vit_tpu.train.trainer import Trainer

GOLDEN = {}

try:
    import os
    with open(os.path.join(os.path.dirname(__file__),
                           "golden_run.json")) as f:
        GOLDEN = json.load(f)
except FileNotFoundError:
    pass


def _run(tmp_path):
    cfg = Config(
        data=DataConfig(backend="memory", augment=True),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=4, num_heads=4, mlp_dim=256,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=1e-3,
                          max_steps=20, eval_strategy="no",
                          save_strategy="steps", save_steps=10_000,
                          load_best_model_at_end=False, logging_steps=1,
                          output_dir=str(tmp_path / "golden"),
                          report_to="none", seed=0),
    )
    fake = build_fake_nih(num_images=120, image_size=64, seed=17)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    tr.train()
    ev = tr.evaluate()
    tr.close()
    losses = []
    with open(tmp_path / "golden" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "train":
                losses.append(rec["loss"])
    return losses, ev


def test_golden_trajectory(tmp_path):
    assert GOLDEN, "tests/golden_run.json missing — regenerate with " \
                   "tools/make_golden.py"
    losses, ev = _run(tmp_path)
    assert len(losses) == 20
    np.testing.assert_allclose(losses, GOLDEN["losses"], rtol=5e-4,
                               err_msg="loss trajectory drifted from the "
                               "golden run — a numerics change landed "
                               "somewhere in the training stack")
    np.testing.assert_allclose(ev["avg_auroc"], GOLDEN["avg_auroc"],
                               atol=5e-3)
    np.testing.assert_allclose(ev["eval_loss"], GOLDEN["eval_loss"],
                               rtol=5e-4)
