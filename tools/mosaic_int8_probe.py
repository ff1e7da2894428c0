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

Usage: python tools/mosaic_int8_probe.py [bf16|int8|int8ep|both] [chain]
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
    bm = int(os.environ.get("PROBE_BM", "1024"))    # rows per grid step
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    def kernel(a_ref, b_ref, o_ref, *, acc_t):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)

    def ep_kernel(a_ref, b_ref, s_ref, bias_ref, o_ref):
        # the integrated serving epilogue: int32 acc -> per-channel static
        # dequant scale -> bias -> bf16 store (halves output HBM traffic
        # vs the int32 store above)
        acc = jax.lax.dot_general(
            a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s_ref[0, 0] + bias_ref[0, 0]
        o_ref[...] = y.astype(jnp.bfloat16)

    def build_ep():
        return pl.pallas_call(
            ep_kernel,
            grid=(m // bm, chain),
            in_specs=[pl.BlockSpec((bm, k), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, k, n), lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, n), lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, n), lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, n), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    def build(acc_t, stream: bool = False):
        # grid: (row block, weight index); chain innermost so the A block
        # is loaded once per row block; the output block is overwritten
        # per weight (we only measure throughput, not keep every product).
        # stream=True forces a DIFFERENT A block every grid step (as the
        # real model does — each matmul reads a fresh activation), so the
        # A DMA must overlap the MXU instead of staying resident.
        a_idx = ((lambda i, c: ((i + c) % (m // bm), 0)) if stream
                 else (lambda i, c: (i, 0)))
        return pl.pallas_call(
            functools.partial(kernel, acc_t=acc_t),
            grid=(m // bm, chain),
            in_specs=[pl.BlockSpec((bm, k), a_idx,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, k, n), lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, n), a_idx,
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

    scales = jnp.asarray(rng.uniform(0.001, 0.01, (chain, 1, n)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((chain, 1, n)), jnp.float32)

    def bench(name, f, a, bs, *extra):
        @jax.jit
        def run(a, bs, *extra):
            return f(a, bs, *extra)[0, 0]

        try:
            float(run(a, bs, *extra))
        except Exception as e:                           # noqa: BLE001
            print(f"{name}: FAILED to compile/run: {str(e)[:300]}")
            return
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(a, bs, *extra)
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
    if which in ("int8stream", "both"):
        bench("mosaic int8 streaming-A", build(jnp.int32, stream=True),
              a8, b8)
    if which in ("int8ep", "both"):
        bench("mosaic int8+dequant->bf16", build_ep(), a8, b8, scales, bias)


if __name__ == "__main__":
    main()
