"""Measure achievable bf16 matmul throughput on the local chip.

Chains ViT-shaped matmuls (the MLP pair at b64: [36928,768]x[768,3072] and
back) so the number is the realistic ceiling for the model's hot loop, not a
synthetic square-matrix peak.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 36928
    d, m = 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, m)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((m, d)) * 0.02, jnp.bfloat16)

    n_pairs = 24

    @jax.jit
    def chain(x, w1, w2):
        def body(x, _):
            h = jnp.dot(x, w1)
            x = jnp.dot(h, w2)
            return x, None
        x, _ = jax.lax.scan(body, x, None, length=n_pairs)
        return x

    for _ in range(3):
        out = chain(x, w1, w2)
        float(out[0, 0])

    iters = 24
    t0 = time.perf_counter()
    for i in range(iters):
        out = chain(x, w1, w2)
        if (i + 1) % 8 == 0:
            float(out[0, 0])
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters

    flops = 2 * 2 * rows * d * m * n_pairs
    print(f"rows={rows}: {flops / dt / 1e12:.1f} TFLOP/s "
          f"({flops / dt / 197e12 * 100:.1f}% of 197T peak)  {dt*1e3:.2f}ms")


if __name__ == "__main__":
    main()
