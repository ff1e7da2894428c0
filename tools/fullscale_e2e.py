"""Full-scale end-to-end Trainer validation on the local chip.

Runs the REAL production path at flagship configuration — NIH-native
1024² synthetic PNGs through C++ decode → crop/pad/resize → ViT-B/16 @384
bf16 train steps (b36, remat, Pallas flash attention) → checkpoint — on
whatever device JAX finds. The bench (bench.py) measures the compute step
on synthetic tensors; this script proves the whole Trainer loop at
production scale, including the host input pipeline.

Usage: python tools/fullscale_e2e.py [num_images] [max_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_images = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from chestxray_vit_tpu.config import (Config, DataConfig, ModelConfig,
                                          TrainConfig)
    from chestxray_vit_tpu.data.testing import build_fake_nih
    from chestxray_vit_tpu.train.trainer import Trainer

    t0 = time.perf_counter()
    fake = build_fake_nih(num_images=num_images, image_size=1024, seed=7)
    print(f"synthetic bucket: {num_images} 1024^2 PNGs in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    cfg = Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(num_classes=15, remat=True),
        train=TrainConfig(batch_size_per_core=36, max_steps=max_steps,
                          learning_rate=1e-4, logging_steps=10,
                          eval_strategy="no", save_strategy="steps",
                          save_steps=max_steps, save_total_limit=1,
                          load_best_model_at_end=False,
                          output_dir="/tmp/cxr_fullscale",
                          report_to="none"))
    trainer = Trainer(cfg, store=fake.store, pretrained=False)
    metrics = trainer.train()
    trainer.ckpt.wait()
    assert trainer.ckpt.latest_step() == max_steps
    trainer.close()
    print(f"OK: {metrics['train_steps']} steps, "
          f"{metrics['train_samples_per_second']:.1f} img/s end-to-end "
          f"(host-pipeline-bound on single-core hosts), checkpoint saved")


if __name__ == "__main__":
    main()
