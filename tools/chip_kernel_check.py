"""On-chip flash-attention parity check (the test suite runs interpret
mode on CPU; this exercises the REAL Mosaic-compiled kernels).

Compares fwd + dq against the XLA oracle across edge sequence lengths.
Tolerances reflect TPU DEFAULT-precision f32 MXU passes (~5e-3 vs
HIGHEST — the same spread XLA's own f32 attention shows; see the
precision note in ops/flash_attention.py). bf16 rows use bf16-scale
tolerances.

Usage: python tools/chip_kernel_check.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.ops.flash_attention import (attention_xla,
                                                       flash_attention)

    rng = np.random.default_rng(0)
    failures = 0
    for dtype, ftol, gtol in ((jnp.float32, 2e-2, 1e-1),
                              (jnp.bfloat16, 5e-2, 2e-1)):
        for s in (1, 2, 15, 16, 17, 127, 129, 255, 577, 1025):
            q, k, v = (jnp.asarray(rng.standard_normal((1, 2, s, 64)),
                                   dtype) for _ in range(3))
            out = flash_attention(q, k, v)
            ref = attention_xla(q, k, v)
            ferr = float(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32)).max())

            def loss(fn):
                return lambda q, k, v: (fn(q, k, v)
                                        .astype(jnp.float32) ** 2).sum()

            g1 = jax.grad(loss(flash_attention), argnums=0)(q, k, v)
            g2 = jax.grad(loss(attention_xla), argnums=0)(q, k, v)
            gerr = float(jnp.abs(g1.astype(jnp.float32)
                                 - g2.astype(jnp.float32)).max())
            ok = ferr < ftol and gerr < gtol
            failures += not ok
            print(f"{np.dtype(dtype).name} s={s}: fwd_err={ferr:.2e} "
                  f"dq_err={gerr:.2e} {'OK' if ok else 'FAIL'}")
    if failures:
        raise SystemExit(f"{failures} kernel parity failures")
    print("all on-chip kernel checks OK")


if __name__ == "__main__":
    main()
