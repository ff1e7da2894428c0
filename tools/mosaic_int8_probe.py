"""Does Mosaic (Pallas) reach the double-rate int8 MXU path that XLA's
lax.dot_general doesn't? One tiled int8 matmul kernel vs the same kernel
in bf16, identical blocking.

Measurement notes (v2 — the first version of this probe was wrong):
- it chained 16 calls of f(a, b) with IDENTICAL operands; pallas_call is
  a pure primitive, so XLA CSE'd the chain to one kernel call and the
  measured ~36 ms was one call plus the ~33 ms tunnel dispatch floor.
  The published 23.3 vs 19.3 TFLOP/s numbers measured mostly latency.
- fix: the weight chain lives INSIDE one kernel as a grid dimension
  ([chain, k, n] stacked weights, chain innermost so the A block stays
  resident), ≥4 TFLOP of real work per dispatch, syncs amortized 4×.

Usage: python tools/mosaic_int8_probe.py [bf16|int8|both] [chain]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k, n = 36864, 768, 768
    bm = 1024                           # rows per grid step
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    def kernel(a_ref, b_ref, o_ref, *, acc_t):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)

    def build(acc_t):
        # grid: (row block, weight index); chain innermost so the A block
        # is loaded once per row block; the output block is overwritten
        # per weight (we only measure throughput, not keep every product)
        return pl.pallas_call(
            functools.partial(kernel, acc_t=acc_t),
            grid=(m // bm, chain),
            in_specs=[pl.BlockSpec((bm, k), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, k, n), lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, n), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), acc_t),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (chain, k, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((chain, k, n)), jnp.bfloat16)

    def bench(name, f, a, bs):
        @jax.jit
        def run(a, bs):
            return f(a, bs)[0, 0]

        try:
            float(run(a, bs))
        except Exception as e:                           # noqa: BLE001
            print(f"{name}: FAILED to compile/run: {str(e)[:300]}")
            return
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(a, bs)
            if (i + 1) % 4 == 0:
                float(out)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        tf = 2 * m * k * n * chain / dt / 1e12
        print(f"{name}: {tf:.1f} TFLOP/s ({dt*1e3:.1f} ms per "
              f"{chain}-weight call)", flush=True)

    if which in ("bf16", "both"):
        bench("mosaic bf16->f32", build(jnp.float32), abf, bbf)
    if which in ("int8", "both"):
        bench("mosaic int8->int32", build(jnp.int32), a8, b8)


if __name__ == "__main__":
    main()
