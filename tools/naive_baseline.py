"""Measured naive baseline: the reference's design translated literally.

The headline `vs_baseline` in bench.py divides by a torch-xla constant that
was estimated, not measured (torch_xla is not installed here). This probe
replaces that soft spot with a *measured* denominator on the same chip: the
same ViT-B/16 @384 fine-tune step configured the way the reference runs it
(`/root/reference/ViT-Training.py:106,161`; pyc:L83,L444 — see SURVEY §2.2):

- batch 8 per core (Version B's BATCH_SIZE_PER_CORE),
- bf16 compute (the reference forces XLA_USE_BF16=1),
- stock XLA attention (jnp einsum softmax — what torch-xla lowers HF's
  eager attention to; no Pallas),
- no rematerialisation tuning, no remat,
- a host sync every step (torch-xla materialises the lazy graph at
  xm.optimizer_step / mark_step each step).

Everything else (model math, AdamW, loss) is identical, so the ratio
framework/naive isolates what the TPU-first design buys *in compute* on
this chip: kernels + batch-size headroom (remat) + shallow pipelining.
The input pipeline (where the reference is additionally network-bound,
SURVEY §3.3) is excluded from both sides.

Usage: python tools/naive_baseline.py [batch_per_chip]
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
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.parallel import mesh as mesh_lib
    from chestxray_vit_tpu.train import steps as S
    from chestxray_vit_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache"))

    batch_per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = Config(model=ModelConfig(num_classes=15, remat=False,
                                   attention_impl="xla"),
                 train=TrainConfig())

    mesh = mesh_lib.build_mesh()
    n_chips = len(jax.devices())
    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=42)
    step = S.jit_train_step(S.make_train_step(cfg, total_steps=10_000),
                            mesh, state)
    state = S.place_state(state, mesh)

    rng = np.random.default_rng(0)
    b = batch_per_chip * n_chips
    batch = mesh_lib.shard_batch(mesh, {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, 384, 384, 3)), jnp.float32),
        "labels": jnp.asarray((rng.random((b, 15)) < 0.2), jnp.float32),
    })

    for _ in range(3):                       # compile + warmup
        state, m = step(state, batch)
        float(m["loss"])

    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
        float(m["loss"])                     # per-step sync, like mark_step
    dt = (time.perf_counter() - t0) / iters
    print(f"naive baseline (xla attention, no remat, b{batch_per_chip}, "
          f"per-step sync): {b / dt / n_chips:.1f} img/s/chip "
          f"({dt * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
