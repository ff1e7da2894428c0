"""int8 serving forward probe: apply_quantized vs the bf16 f32-weight
forward at the same batch (compare with tools/fwd_probe.py).

Usage: python tools/quant_probe.py [batch] [dynamic|static|pallas|bf16] [variant]

``bf16`` runs the plain serving forward (vit.apply) for an in-tool
apples-to-apples row; ``variant`` is a VIT_VARIANTS key (default vit_b16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.models.quantized import (
        apply_quantized,
        calibrate_vit_scales,
        quantize_vit_params,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mode = sys.argv[2] if len(sys.argv) > 2 else "dynamic"
    variant = sys.argv[3] if len(sys.argv) > 3 else "vit_b16"
    if variant == "vit_b16":
        cfg = ModelConfig(num_classes=15)
    else:
        from chestxray_vit_tpu.config import vit_variant_config
        cfg = vit_variant_config(variant)
        cfg.remat = False                      # forward-only
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, cfg.img_size, cfg.img_size,
                                         3)), jnp.float32)
    if mode == "bf16":
        fwd = jax.jit(lambda p, x: vit.apply(p, x, cfg))
        qparams = params
    else:
        scales = (calibrate_vit_scales(params, x[:8], cfg)
                  if mode in ("static", "pallas") else None)
        qparams = quantize_vit_params(params, scales)
        backend = "pallas" if mode == "pallas" else "xla"
        fwd = jax.jit(lambda qp, x: apply_quantized(qp, x, cfg,
                                                    backend=backend))

    t0 = time.perf_counter()
    for _ in range(3):
        out = fwd(qparams, x)
        float(out[0, 0])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 48
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(qparams, x)
        if (i + 1) % 8 == 0:
            float(out[0, 0])
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    extra = ""
    if variant == "vit_b16":
        extra = f"(bf16-peak mfu={ips * (332.9e9 / 3) / 197e12:.4f})  "
    print(f"{mode} fwd {variant} batch={batch}: {ips:.1f} img/s  "
          f"{extra}{dt * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
