"""Does Mosaic (Pallas) reach the double-rate int8 MXU path that XLA's
lax.dot_general doesn't? One tiled int8 matmul kernel vs the same kernel
in bf16, identical blocking.

Usage: python tools/mosaic_int8_probe.py
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

    def kernel(a_ref, b_ref, o_ref, *, acc_t):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)

    def build(dtype, acc_t):
        return pl.pallas_call(
            functools.partial(kernel, acc_t=acc_t),
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), acc_t),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    chain = 16

    def bench(name, f, a, b):
        @jax.jit
        def run(a, b):
            acc = None
            for i in range(chain):
                y = f(a, b)
                s = y[0, 0]
                acc = s if acc is None else acc + s
            return acc

        try:
            float(run(a, b))
        except Exception as e:                           # noqa: BLE001
            print(f"{name}: FAILED to compile/run: {str(e)[:300]}")
            return
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            float(run(a, b))
        dt = (time.perf_counter() - t0) / iters
        tf = 2 * m * k * n * chain / dt / 1e12
        print(f"{name}: {tf:.1f} TFLOP/s ({dt*1e3:.1f} ms/chain)",
              flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("bf16", "both"):
        bench("mosaic bf16->f32", build(jnp.bfloat16, jnp.float32),
              abf, bbf)
    if which in ("int8", "both"):
        bench("mosaic int8->int32", build(jnp.int8, jnp.int32), a8, b8)


if __name__ == "__main__":
    main()
