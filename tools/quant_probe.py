"""int8 serving forward probe: apply_quantized vs the bf16 f32-weight
forward at the same batch (compare with tools/fwd_probe.py).

Usage: python tools/quant_probe.py [batch] [dynamic|static]
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
    cfg = ModelConfig(num_classes=15)
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 384, 384, 3)), jnp.float32)
    scales = (calibrate_vit_scales(params, x[:8], cfg)
              if mode == "static" else None)
    qparams = quantize_vit_params(params, scales)

    fwd = jax.jit(lambda qp, x: apply_quantized(qp, x, cfg))

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
    mfu_bf16 = ips * (332.9e9 / 3) / 197e12
    print(f"int8[{mode}] fwd batch={batch}: {ips:.1f} img/s  "
          f"(bf16-peak mfu={mfu_bf16:.4f})  {dt * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
