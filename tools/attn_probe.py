"""Time attention in isolation at ViT-B@384 b64 shapes: [64,12,577,64].

Usage: python tools/attn_probe.py [impl] [block_q] [block_bh] [s] [b]
Also times the qkv head-split transposes alone, and the full _mha chain.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.ops import flash_attention as fa


def timeit(fn, *args, iters=48):
    out = fn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 8 == 0:
            float(jnp.sum(out[0]) if isinstance(out, tuple)
                  else jnp.sum(out))
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    block_q = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    block_bh = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    s = int(sys.argv[4]) if len(sys.argv) > 4 else 577
    b = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    h, d = 12, 64
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.1,
                           jnp.bfloat16) for _ in range(3))

    if impl == "pallas":
        f = jax.jit(lambda q, k, v: fa.flash_attention(
            q, k, v, None, block_q, block_bh))
    else:
        f = jax.jit(fa.attention_xla)
    dt = timeit(f, q, k, v)
    print(f"attn {impl} bq={block_q} bbh={block_bh} s={s} b={b}: "
          f"{dt * 1e3:.2f}ms/call  x12 layers = {dt * 12 * 1e3:.1f}ms",
          flush=True)

    # transposes alone: [b,s,h*d] -> [b,h,s,d] x3 + inverse x1
    x = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.1, jnp.bfloat16)

    @jax.jit
    def transposes(x):
        t = x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        return (t + 1).transpose(0, 2, 1, 3).reshape(b, s, h * d)

    dt = timeit(transposes, x)
    print(f"head transpose pair: {dt * 1e3:.2f}ms/call  "
          f"x12x2 = {dt * 24 * 1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
