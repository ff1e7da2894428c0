"""Packed (NaViT-style) train-step probe on the local chip.

Usage: python tools/packed_probe.py [n_seqs] [sync] [remat] [tome_r] [sched]
  n_seqs  packed sequences per step (default 32; each carries two
          384px-class images → 1152 tokens, the BENCH_NOTES config)
  sync    sync window in steps (default 16)
  remat   0|1 (default 1)
  tome_r  within-segment token merging rate (default 0 = off); this
          config packs 2×576 tokens with no padding, so every merge
          hits real content (worst case for the pad-first rule)
  sched   constant|decreasing (default constant)

Prints images/sec/chip. Timing discipline per BENCH_NOTES.md (scalar sync).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import Config, ModelConfig, TrainConfig
    from chestxray_vit_tpu.data import packing as pk
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.train import steps as S
    from chestxray_vit_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache"))

    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sync = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    remat = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    tome_r = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    sched = sys.argv[5] if len(sys.argv) > 5 else "constant"

    cfg = Config(model=ModelConfig(num_classes=15, remat=remat,
                                   tome_r=tome_r, tome_schedule=sched),
                 train=TrainConfig())

    # two 384px-class (24×24-patch = 576-token) images per 1152-token seq
    rng = np.random.default_rng(0)
    imgs_per_seq = 2
    n_imgs = n_seqs * imgs_per_seq
    images = [rng.integers(0, 255, (384, 384), np.uint8)
              for _ in range(n_imgs)]
    labels = [(rng.random(15) < 0.2).astype(np.float32)
              for _ in range(n_imgs)]
    pb = pk.pack_images(images, labels, patch=16, seq_len=1152,
                        max_imgs_per_seq=imgs_per_seq)
    batch = {
        "tokens": jnp.asarray(pb.tokens),
        "segment_ids": jnp.asarray(pb.segment_ids),
        "pos_indices": jnp.asarray(pb.pos_indices),
        "pool_weights": jnp.asarray(pb.pool_weights),
        "labels": jnp.asarray(pb.labels),
        "image_mask": jnp.asarray(pb.image_mask),
    }

    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=42)
    step = jax.jit(S.make_packed_train_step(cfg, total_steps=10_000),
                   donate_argnums=(0,))

    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, batch)
        float(m["loss"])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 24
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch)
        if (i + 1) % sync == 0:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    ips = n_imgs / dt
    print(f"n_seqs={n_seqs} sync={sync} remat={int(remat)} "
          f"tome_r={tome_r} sched={sched}: "
          f"{ips:.2f} img/s/chip  step={dt * 1e3:.1f}ms")


if __name__ == "__main__":
    main()
