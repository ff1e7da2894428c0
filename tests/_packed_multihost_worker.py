"""Worker for the real 2-process multi-host PACKED trainer test.

Runs OUTSIDE pytest: forces a 4-device CPU platform, joins a 2-process
jax.distributed cluster (8 global devices), and trains the tiny synthetic
config through the REAL PackedTrainer multi-host path — host-sharded
packing streams (order[rank::2]), form_global_batch assembly, per-host
cursor accounting — then writes per-step losses JSON.

Usage: python tests/_packed_multihost_worker.py <process_id> <port> <outdir>
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
    from chestxray_vit_tpu.train.packed_trainer import PackedTrainer

    # deliberately tiny: two full jax.distributed processes share ONE CPU
    # core on this box, so every compile runs twice at half speed
    cfg = Config(
        data=DataConfig(backend="memory", num_workers=2),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=32,
                          num_layers=1, num_heads=2, mlp_dim=64,
                          dtype="float32", attention_impl="xla"),
        # SHARED output dir: the checkpoint is one logical multi-process
        # Orbax save (collective — per-rank dirs would deadlock its
        # cross-process barrier; they are exactly the reference pathology
        # SURVEY §5 says not to replicate). Logs already disambiguate by
        # rank inside the dir (metrics.rank1.jsonl).
        train=TrainConfig(learning_rate=2e-3, max_steps=3,
                          eval_strategy="no", save_strategy="steps",
                          save_steps=3, logging_steps=1,
                          load_best_model_at_end=False,
                          output_dir=os.path.join(outdir, "shared"),
                          report_to="none", seed=0),
    )
    fake = build_fake_nih(num_images=96, image_size=64, seed=13)
    tr = PackedTrainer(cfg, seq_len=48, grids=(2, 3, 4), batch_seqs=8,
                       store=fake.store, pretrained=False, census_sample=8)
    assert tr._hosts == 2 and tr._local_step_seqs == 4
    tr.train()
    tr.ckpt.wait()
    # multi-host packed eval: host-local jit on the local param replica —
    # must run (not crash on global arrays) and agree across ranks
    ev = tr.evaluate()
    # the persisted cursor must carry per-host image counts
    _, cursor, _ = tr.ckpt.restore(tr.ckpt.latest_step(), tr.state)
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
        json.dump({"losses": losses,
                   "cursor": {"epoch": cursor.epoch,
                              "batch_in_epoch": cursor.batch_in_epoch,
                              "per_host": cursor.per_host},
                   "eval": {"avg_auroc": ev["avg_auroc"],
                            "eval_loss": ev["eval_loss"]},
                   "steps_per_epoch": tr.steps_per_epoch,
                   "process_count": jax.process_count()}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
