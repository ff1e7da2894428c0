"""DataConfig.preprocess_placement='device': the fused MXU crop/pad/resize/
normalize kernel (ops/preprocess.py) runs INSIDE the train/eval step's jit,
fed raw decode canvases — the SURVEY §3.3 flagship path, now first-class in
training (it previously served only inference)."""

import numpy as np
import pytest

from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.data import pipeline as pipe
from chestxray_vit_tpu.data.testing import build_fake_nih
from chestxray_vit_tpu.ops.preprocess import prepare_pixel_values
from chestxray_vit_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def fake():
    return build_fake_nih(num_images=48, image_size=64, seed=7)


def _cfg(tmp_path, **data_kw) -> Config:
    data = dict(backend="memory", preprocess_placement="device",
                decode_canvas=128)
    data.update(data_kw)
    return Config(
        data=DataConfig(**data),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=2e-3,
                          max_steps=3, eval_strategy="no",
                          save_strategy="steps", save_steps=100,
                          load_best_model_at_end=False, logging_steps=100,
                          output_dir=str(tmp_path / "out"),
                          report_to="none", seed=0),
    )


def _loaders(tr: Trainer, augment: bool):
    host = pipe.SampleLoader(
        tr.bundle.train, tr.bundle.blob_map, tr.bundle.store,
        img_size=64, placement="host", augment=augment)
    dev = pipe.SampleLoader(
        tr.bundle.train, tr.bundle.blob_map, tr.bundle.store,
        img_size=64, placement="device", canvas_size=128, augment=augment)
    return host, dev


@pytest.mark.parametrize("augment", [False, True])
def test_host_and_device_placements_agree(tmp_path, fake, augment):
    """Same sample, same RNG stream → same normalized pixels, whether the
    geometry ran on host PIL or the fused device kernel. Host quantizes to
    u8 after the resize, so agreement is within 1-2 gray levels."""
    cfg = _cfg(tmp_path, augment=augment)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    host, dev = _loaders(tr, augment)
    for i in range(6):
        rng_h = np.random.default_rng((1, i))
        rng_d = np.random.default_rng((1, i))
        sh = {k: np.asarray(v)[None] for k, v in host.load(i, rng_h).items()}
        sd = {k: np.asarray(v)[None] for k, v in dev.load(i, rng_d).items()}
        ph = np.asarray(prepare_pixel_values(sh, out_size=64))
        pd = np.asarray(prepare_pixel_values(sd, out_size=64))
        assert ph.shape == pd.shape == (1, 64, 64, 3)
        np.testing.assert_allclose(ph, pd, atol=2.5 / 255 * 2)  # std=0.5
    tr.close()


def test_trains_end_to_end_with_device_placement(tmp_path, fake):
    cfg = _cfg(tmp_path)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    metrics = tr.train()
    assert metrics["train_steps"] == 3
    ev = tr.evaluate()
    assert np.isfinite(ev["eval_loss"])
    tr.close()


def test_device_placement_with_augmentation_trains(tmp_path, fake):
    """Augmented (RandomResizedCrop stretch + flip) batches ride the same
    fused kernel via the per-sample stretches mask."""
    cfg = _cfg(tmp_path, augment=True)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    batch = next(iter(tr._train_batches(epoch=0)))
    assert "canvas_u8" in batch and "stretches" in batch
    assert bool(np.all(np.asarray(batch["stretches"])))  # train → RRC
    metrics = tr.train()
    assert metrics["train_steps"] == 3
    tr.close()
