"""PackedTrainer end-to-end on the synthetic bucket: variable-resolution
NIH images packed into shared sequences, trained and evaluated packed
(BASELINE configs[4] as a full training path)."""

import io

import numpy as np
import pytest
from PIL import Image

from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.data.storage import MemoryStore
from chestxray_vit_tpu.data.testing import build_fake_nih
from chestxray_vit_tpu.train.packed_trainer import PackedTrainer

GRIDS = (2, 3, 4)   # 32/48/64 px at patch 16


@pytest.fixture(scope="module")
def fake_varres():
    """Fake bucket with VARIABLE resolutions (the packed use case)."""
    fake = build_fake_nih(num_images=60, image_size=64, seed=21)
    rng = np.random.default_rng(0)
    # rewrite a third of the images at smaller resolutions
    for i, name in enumerate(fake.image_names):
        if i % 3 == 0:
            size = int(rng.choice([32, 48]))
            arr = rng.integers(0, 255, (size, size), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr, "L").save(buf, format="PNG")
            folder = (i % 12) + 1
            fake.store.put(f"images_{folder:03d}/images/{name}",
                           buf.getvalue())
    return fake


def _cfg(tmp_path):
    return Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(learning_rate=1e-3, max_steps=6,
                          eval_strategy="no", save_strategy="steps",
                          save_steps=1000, logging_steps=2,
                          load_best_model_at_end=False,
                          output_dir=str(tmp_path / "out"),
                          report_to="none"))


def test_packed_trainer_trains_and_evaluates(tmp_path, fake_varres):
    tr = PackedTrainer(_cfg(tmp_path), seq_len=48, grids=GRIDS,
                       batch_seqs=8, store=fake_varres.store,
                       pretrained=False)
    metrics = tr.train()
    assert int(tr.state.step) == 6
    assert metrics["train_steps"] == 6
    ev = tr.evaluate()
    assert 0.0 <= ev["avg_auroc"] <= 1.0
    assert np.isfinite(ev["eval_loss"])
    # packed predict over the test split: one logit row per image
    logits, labels, test_metrics = tr.predict()
    assert logits.shape[0] == len(tr.bundle.test)
    assert labels.shape == logits.shape
    tr.close()


def test_packed_trainer_rejects_bad_dp(tmp_path, fake_varres):
    with pytest.raises(ValueError, match="divisible"):
        PackedTrainer(_cfg(tmp_path), seq_len=48, grids=GRIDS,
                      batch_seqs=3, store=fake_varres.store,
                      pretrained=False)
