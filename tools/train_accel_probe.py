"""Measure the round-4 TRAIN-step levers on the local chip.

The two serving levers round 3 proved (+28% int8, ~linear-in-tokens
merging) pointed at the flat ~233 img/s train step (VERDICT r3 next
#2/#3):

    python tools/train_accel_probe.py dense [batch]        # baseline
    python tools/train_accel_probe.py tome  [batch] [r]    # model.tome_r
    python tools/train_accel_probe.py int8  [batch]        # int8-STE fwd

Trailing ``remat=0/1`` overrides the batch>32 remat heuristic (merging
shrinks activation memory — large-r steps may fit without remat);
``sched=decreasing`` picks the front-loaded merge schedule;
``model=vit_l16`` / ``img=512`` select a VIT_VARIANTS config.

Prints img/s/chip (per-step scalar sync, sync-16 window — timing
discipline per BENCH_NOTES.md). Defaults: batch 36 (the measured dense
sweet spot), r 16.
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

    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    pos = [a for a in sys.argv[1:] if "=" not in a]
    mode = pos[0] if pos else "dense"
    batch = int(pos[1]) if len(pos) > 1 else 36
    r = int(pos[2]) if len(pos) > 2 else 16
    # remat=0/1 overrides the default batch>32 heuristic — merging shrinks
    # activation memory, so large-r tome steps may fit WITHOUT remat (and
    # skip the recompute half of the backward)
    remat = bool(int(kv["remat"])) if "remat" in kv else batch > 32
    sched = kv.get("sched", "constant")   # constant | decreasing
    variant = kv.get("model", "vit_b16")  # VIT_VARIANTS key

    enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache"))

    n_chips = len(jax.devices())
    img = int(kv.get("img", 384))
    if variant != "vit_b16" or img != 384:
        from chestxray_vit_tpu.config import vit_variant_config
        mcfg = vit_variant_config(variant, img_size=img)
        if "remat" in kv:                  # explicit kv always wins
            mcfg.remat = remat
        else:
            # variant default (L/H) OR the batch heuristic OR high-res:
            # @512 dense at b32 measures 67.8 G unrematerialized (OOM)
            mcfg.remat = mcfg.remat or batch > 32 or img > 384
        remat = mcfg.remat
    else:
        mcfg = ModelConfig(num_classes=15, remat=remat)
    mcfg.tome_r = r if mode == "tome" else 0
    mcfg.tome_schedule = sched
    cfg = Config(model=mcfg, train=TrainConfig())

    mesh = mesh_lib.build_mesh()
    params = vit.init_params(jax.random.key(0), cfg.model)

    rng = np.random.default_rng(0)
    b = batch * n_chips
    batch_data = mesh_lib.shard_batch(mesh, {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, mcfg.img_size, mcfg.img_size, 3)),
            jnp.float32),
        "labels": jnp.asarray((rng.random((b, 15)) < 0.2), jnp.float32),
    })

    if mode == "int8":
        # static scales from a calibration forward on this batch (what a
        # Trainer integration would do on its first batch), then a train
        # step whose loss runs apply_int8_train
        from chestxray_vit_tpu.models.quantized import calibrate_vit_scales
        from chestxray_vit_tpu.ops.preprocess import prepare_pixel_values

        images = prepare_pixel_values(
            {"pixel_values": batch_data["pixel_values"]},
            out_size=384, mean=cfg.data.image_mean, std=cfg.data.image_std)
        scales = jax.tree.map(np.asarray,
                              calibrate_vit_scales(params, images,
                                                   cfg.model))
        step_fn = S.make_train_step(cfg, total_steps=10_000,
                                    int8_scales=scales)
    else:
        step_fn = S.make_train_step(cfg, total_steps=10_000)

    state = S.TrainState.create(params, seed=42)
    step = S.jit_train_step(step_fn, mesh, state)
    state = S.place_state(state, mesh)

    for _ in range(3):
        state, m = step(state, batch_data)
        float(m["loss"])

    iters = 32
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch_data)
        if (i + 1) % 16 == 0:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    ips = b / dt / n_chips
    print((f"model={variant} " if variant != "vit_b16" else "")
          + (f"img={img} " if img != 384 else "")
          + f"mode={mode} batch={batch}/chip"
          + (f" r={r}" if mode == "tome" else "")
          + (f" sched={sched}" if sched != "constant" else "")
          + f" remat={int(remat)}"
          + f": {ips:.1f} img/s/chip ({dt * 1e3:.1f} ms/step,"
          f" loss {float(m['loss']):.4f})")


if __name__ == "__main__":
    main()
