"""Raw int8 vs bf16 matmul throughput at ViT shapes — does XLA lower
int8×int8→int32 to the double-rate MXU path on this stack?

Usage: python tools/int8_matmul_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    m, k, n = 36864, 768, 768          # b64 × 576 tokens, ViT-B proj shape
    chain = 24
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (chain, k, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((chain, k, n)), jnp.bfloat16)

    @jax.jit
    def chain_i8(a, bs):
        # 24 independent contractions (distinct weights) amortize the
        # ~4 ms tunnel sync floor without inter-matmul data movement
        acc = jnp.zeros((), jnp.int32)
        for i in range(chain):
            y = jax.lax.dot_general(a, bs[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = acc + y[0, 0]
        return acc

    @jax.jit
    def chain_bf(a, bs):
        acc = jnp.zeros((), jnp.float32)
        for i in range(chain):
            y = jax.lax.dot_general(a, bs[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = acc + y[0, 0]
        return acc

    flops = 2 * m * k * n * chain

    for name, fn, args in (("int8", chain_i8, (a8, b8)),
                           ("bf16", chain_bf, (abf, bbf))):
        float(fn(*args))               # compile
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            float(fn(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {flops / dt / 1e12:.1f} TFLOP/s  ({dt*1e3:.2f} ms "
              f"per 12-matmul chain)", flush=True)


if __name__ == "__main__":
    main()
