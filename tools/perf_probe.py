"""Perf probe: sweep one train-step config on the local chip.

Usage: python tools/perf_probe.py [batch] [remat_policy] [block_q] [sync] [img]
  batch        per-chip batch (default 64)
  remat_policy full|attn|attn_mlp|mlp|dots|none (default full)
  block_q      0=auto (default), else Q-block rows
  sync         sync window in steps (default 8)
  img          image size (default 384; 512 → 1025-token blocked attention)
  model        b|l (default b)
  placement    pixels|u8|canvas (default pixels): what the host ships —
               f32 NHWC, host-resized u8 grayscale, or raw 1024² decode
               canvases + crop boxes for the fused device preprocess

Prints img/s/chip + MFU. Timing discipline per BENCH_NOTES.md (scalar sync).
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    policy = sys.argv[2] if len(sys.argv) > 2 else "full"
    block_q = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    sync = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    img = int(sys.argv[5]) if len(sys.argv) > 5 else 384
    size = sys.argv[6] if len(sys.argv) > 6 else "b"
    placement = sys.argv[7] if len(sys.argv) > 7 else "pixels"

    from chestxray_vit_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache"))

    n_chips = len(jax.devices())
    arch = ({"hidden_size": 1024, "num_layers": 24, "num_heads": 16,
             "mlp_dim": 4096} if size == "l" else {})
    cfg = Config(model=ModelConfig(num_classes=15, img_size=img,
                                   remat=policy != "none",
                                   remat_policy=policy if policy != "none"
                                   else "full", **arch),
                 train=TrainConfig())
    if block_q:
        import chestxray_vit_tpu.ops.flash_attention as fa
        orig = fa.attention

        def patched(q, k, v, impl="auto", block_q_arg=0):
            return orig(q, k, v, impl=impl, block_q=block_q)
        fa.attention = patched
        vit.attention = patched

    mesh = mesh_lib.build_mesh()
    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=42)
    step = S.jit_train_step(S.make_train_step(cfg, total_steps=10_000),
                            mesh, state)
    state = S.place_state(state, mesh)

    rng = np.random.default_rng(0)
    b = batch * n_chips
    labels = jnp.asarray((rng.random((b, 15)) < 0.2), jnp.float32)
    if placement == "canvas":
        host = {
            "canvas_u8": jnp.asarray(
                rng.integers(0, 255, (b, 1024, 1024)), jnp.uint8),
            "boxes": jnp.tile(jnp.asarray([[0, 0, 1024, 1024]], jnp.int32),
                              (b, 1)),
            "flips": jnp.zeros((b,), bool),
            "stretches": jnp.zeros((b,), bool),
        }
    elif placement == "u8":
        host = {"pixel_values_u8": jnp.asarray(
            rng.integers(0, 255, (b, img, img)), jnp.uint8)}
    else:
        host = {"pixel_values": jnp.asarray(
            rng.standard_normal((b, img, img, 3)), jnp.float32)}
    batch_d = mesh_lib.shard_batch(mesh, {**host, "labels": labels})

    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, batch_d)
        float(m["loss"])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 24
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch_d)
        if (i + 1) % sync == 0:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    ips = b / dt / n_chips
    from chestxray_vit_tpu.utils import flops as F
    mfu = ips * F.model_flops_per_image(cfg.model) / F.chip_peak_flops()
    print(f"batch={batch} policy={policy} block_q={block_q} sync={sync} "
          f"img={img} placement={placement}: {ips:.2f} img/s/chip  "
          f"mfu={mfu:.4f}  step={dt * 1e3:.1f}ms")


if __name__ == "__main__":
    main()
