"""Trainer-level eval step probe: make_eval_step (bf16 forward) vs
make_quantized_eval_step (static int8) at full ViT-B @384 — includes the
fused preprocess + per-row BCE loss, i.e. exactly what
`train.eval_quantize=static` buys in `cli eval` / `predict`.

Usage: python tools/eval_quant_probe.py [batch] [bf16|static]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import Config, ModelConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.models.quantized import (
        calibrate_vit_scales,
        quantize_vit_params,
    )
    from chestxray_vit_tpu.train import steps as S

    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mode = sys.argv[2] if len(sys.argv) > 2 else "static"
    cfg = Config()
    cfg.model = ModelConfig(num_classes=15, remat=False)

    params = vit.init_params(jax.random.key(0), cfg.model)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((batch_n, 384, 384, 3)), jnp.float32),
        "labels": jnp.asarray((rng.random((batch_n, 15)) < 0.2),
                              jnp.float32),
    }

    if mode == "static":
        scales = calibrate_vit_scales(params, batch["pixel_values"][:8],
                                      cfg.model)
        fwd_params = quantize_vit_params(params, scales)
        step = jax.jit(S.make_quantized_eval_step(cfg))
    else:
        fwd_params = params
        step = jax.jit(S.make_eval_step(cfg))

    t0 = time.perf_counter()
    logits, row_loss = step(fwd_params, batch)
    float(row_loss[0])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 48
    t0 = time.perf_counter()
    for i in range(iters):
        logits, row_loss = step(fwd_params, batch)
        if (i + 1) % 8 == 0:
            float(row_loss[0])
    float(row_loss[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"eval step [{mode}] batch={batch_n}: {batch_n / dt:.1f} img/s  "
          f"{dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
