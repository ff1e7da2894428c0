"""HF-datasets adapter tests (Version A data path) using an in-memory
datasets.Dataset — no hub access."""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from PIL import Image  # noqa: E402

from chestxray_vit_tpu.data import pipeline as pipe  # noqa: E402
from chestxray_vit_tpu.data.hf_datasets import (  # noqa: E402
    HFDatasetAdapter,
    _resize_center_crop,
    class_names_of,
    split_hf_dataset,
)

CLASSES = ["Atelectasis", "Cardiomegaly", "Effusion", "No Finding"]


@pytest.fixture(scope="module")
def hf_ds():
    rng = np.random.default_rng(0)
    images = [Image.fromarray(
        rng.integers(0, 255, (48, 64), np.uint8), "L") for _ in range(30)]
    labels = [[int(rng.integers(0, 4))] for _ in range(30)]
    feats = datasets.Features({
        "image": datasets.Image(),
        "labels": datasets.Sequence(datasets.ClassLabel(names=CLASSES)),
    })
    return datasets.Dataset.from_dict(
        {"image": images, "labels": labels}, features=feats)


def test_class_names(hf_ds):
    assert class_names_of(hf_ds) == CLASSES


def test_split_80_10_10(hf_ds):
    tr, va, te = split_hf_dataset(hf_ds, seed=42)
    assert len(tr) + len(va) + len(te) == 30
    assert len(tr) == 24


def test_adapter_eval_sample(hf_ds):
    ad = HFDatasetAdapter(hf_ds, CLASSES, img_size=32)
    s = ad.load(0)
    assert s["pixel_values_u8"].shape == (32, 32)
    assert s["labels"].shape == (4,)
    assert s["labels"].sum() == 1.0


def test_adapter_augmented_sample(hf_ds):
    ad = HFDatasetAdapter(hf_ds, CLASSES, img_size=32, augment=True)
    rng = np.random.default_rng(1)
    s = ad.load(0, rng)
    assert s["pixel_values_u8"].shape == (32, 32)


def test_adapter_feeds_iterate_batches(hf_ds):
    ad = HFDatasetAdapter(hf_ds, CLASSES, img_size=32)
    batches = list(pipe.iterate_batches(ad, 8, drop_last=True))
    assert len(batches) == 3
    assert batches[0]["pixel_values_u8"].shape == (8, 32, 32)
    assert batches[0]["labels"].shape == (8, 4)


def test_resize_center_crop_semantics():
    # wide image: shorter side (h) → size, then center-crop width
    gray = np.zeros((40, 80), np.uint8)
    gray[:, 40:] = 255   # right half bright
    out = _resize_center_crop(gray, 32)
    assert out.shape == (32, 32)
    # center crop should straddle the bright boundary
    assert out[:, :8].mean() < 64 and out[:, -8:].mean() > 192


def test_trainer_with_hf_adapters(tmp_path, hf_ds):
    """Version A end-to-end: HF dataset adapters through the full Trainer."""
    from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from chestxray_vit_tpu.data.hf_datasets import split_hf_dataset
    from chestxray_vit_tpu.train.trainer import Trainer

    tr_ds, va_ds, te_ds = split_hf_dataset(hf_ds)
    mk = lambda split, aug: HFDatasetAdapter(split, CLASSES, img_size=32,
                                             augment=aug)
    cfg = Config(
        data=DataConfig(backend="hf_dataset", augment=True),
        model=ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, max_steps=3,
                          eval_strategy="no", save_strategy="steps",
                          save_steps=100, load_best_model_at_end=False,
                          logging_steps=1, report_to="none",
                          output_dir=str(tmp_path / "out")))
    trainer = Trainer(cfg, pretrained=False,
                      datasets=(mk(tr_ds, True), mk(va_ds, False),
                                mk(te_ds, False), CLASSES))
    assert cfg.model.num_classes == 4
    trainer.train()
    assert int(trainer.state.step) == 3
    ev = trainer.evaluate()
    assert "avg_auroc" in ev and "f1_micro" in ev
    trainer.close()


def test_string_labels(hf_ds):
    ad = HFDatasetAdapter(hf_ds, CLASSES, img_size=32)
    row = {"image": Image.fromarray(np.zeros((32, 32), np.uint8), "L"),
           "labels": ["Cardiomegaly", "Effusion"]}
    ad2 = HFDatasetAdapter([row], CLASSES, img_size=32)
    s = ad2.load(0)
    np.testing.assert_array_equal(s["labels"], [0, 1, 1, 0])
