"""Worker for the real 2-process multi-host trainer test.

Runs OUTSIDE pytest (spawned subprocess): forces a 4-device CPU platform,
joins a 2-process jax.distributed cluster (8 global devices), trains the
tiny synthetic config through the REAL Trainer multi-host path
(host-sliced decode -> host_local_array_to_global_array -> sharded step),
evaluates, and writes results JSON.

Usage: python tests/_multihost_worker.py <process_id> <coord_port> <outdir>
"""

import json
import os
import re
import sys


def main() -> int:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    outdir = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", "")).strip()
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from chestxray_vit_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig)
    from chestxray_vit_tpu.data.testing import build_fake_nih
    from chestxray_vit_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(backend="memory", augment=True),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=2e-3,
                          max_steps=4, eval_strategy="no",
                          save_strategy="steps", save_steps=10_000,
                          load_best_model_at_end=False, logging_steps=1,
                          output_dir=os.path.join(outdir, f"rank{pid}"),
                          report_to="none", seed=0),
    )
    fake = build_fake_nih(num_images=80, image_size=64, seed=11)
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    assert tr.mesh.shape["data"] == 8 and tr.global_batch == 16
    tr.train()
    ev = tr.evaluate()
    tr.close()

    losses = []
    jsonl = os.path.join(cfg.train.output_dir,
                         "metrics.jsonl" if pid == 0
                         else "metrics.rank1.jsonl")
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "train":
                losses.append(rec["loss"])
    with open(os.path.join(outdir, f"result_rank{pid}.json"), "w") as f:
        json.dump({"losses": losses, "eval": ev,
                   "steps": 4, "process_count": jax.process_count()}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
