"""Ablate forward-pass components to locate the non-matmul overhead.

Usage: python tools/fwd_ablate.py [variant]
  full        unmodified forward
  no_attn     attention op returns v (qkv/proj matmuls still run)
  no_ln       layer_norm is identity
  no_both     both ablations
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit

    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    if variant in ("no_attn", "no_both"):
        vit.attention = lambda q, k, v, impl="auto", block_q=0: v
    if variant in ("no_ln", "no_both"):
        vit.layer_norm = lambda x, s, b, eps=1e-12: x

    cfg = ModelConfig(num_classes=15)
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 384, 384, 3)), jnp.float32)

    @jax.jit
    def fwd(params, x):
        return vit.apply(params, x, cfg)

    for _ in range(3):
        out = fwd(params, x)
        float(out[0, 0])

    iters = 48
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, x)
        if (i + 1) % 8 == 0:
            float(out[0, 0])
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant} b{batch}: {dt * 1e3:.2f}ms  {batch / dt:.1f} img/s")


if __name__ == "__main__":
    main()
