"""Raw int8 vs bf16 matmul throughput at ViT shapes — does XLA lower
int8×int8→int32 to the double-rate MXU path on this stack?

Measurement notes (v2 — the first version of this probe was wrong):
- the original chained 24 dots and synced EVERY chain; at ~33 ms tunnel
  dispatch round-trip the measured 31 ms/chain was the sync floor, not
  the MXU (it reported 33.3 TFLOP/s for BOTH dtypes — i.e. nothing).
- `acc + y[0, 0]` also invites XLA to simplify slice-of-dot into a
  vector dot; and `sum(y)` can fold into two matvecs
  (1ᵀA·B1). The epilogue must be non-linear: max(y) fuses as a
  reduction epilogue but cannot be rewritten through the contraction.
- fix: 96 distinct-weight dots per compiled chain (≥4 TFLOP of real
  work, ~25 ms at peak ≫ any per-dispatch cost) and sync every 4
  dispatches, like tools/matmul_peak.py.

Usage: python tools/int8_matmul_probe.py [chain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    m, k, n = 36864, 768, 768          # b64 × 576 tokens, ViT-B proj shape
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (chain, k, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((chain, k, n)), jnp.bfloat16)

    def make_chain(acc_t):
        @jax.jit
        def f(a, bs):
            def body(acc, b):
                y = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
                # max() is a fused reduction epilogue XLA cannot rewrite
                # through the contraction (unlike slices or plain sums)
                return acc + jnp.max(y), None
            acc, _ = lax.scan(body, jnp.zeros((), acc_t), bs)
            return acc
        return f

    flops = 2 * m * k * n * chain

    for name, acc_t, args in (("int8", jnp.int32, (a8, b8)),
                              ("bf16", jnp.float32, (abf, bbf))):
        fn = make_chain(acc_t)
        for _ in range(2):
            float(fn(*args))           # compile + warm
        iters = 12
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*args)
            if (i + 1) % 4 == 0:
                float(out)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {flops / dt / 1e12:.1f} TFLOP/s  ({dt*1e3:.2f} ms "
              f"per {chain}-matmul chain)", flush=True)


if __name__ == "__main__":
    main()
