"""Forward-only probe: isolates forward-pass efficiency from bwd/remat/optim.

Usage: python tools/fwd_probe.py [batch] [attn_impl] [block_q]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import Config, ModelConfig
    from chestxray_vit_tpu.models import vit

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
    block_q = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    block_bh = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    cfg = ModelConfig(num_classes=15, attention_impl=impl)
    if block_q or block_bh:
        import chestxray_vit_tpu.ops.flash_attention as fa
        orig = fa.attention

        def patched(q, k, v, impl="auto", **_):
            return orig(q, k, v, impl=impl, block_q=block_q,
                        block_bh=block_bh or fa.DEFAULT_BLOCK_BH)
        fa.attention = patched
        vit.attention = patched

    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 384, 384, 3)), jnp.float32)

    @jax.jit
    def fwd(params, x):
        return vit.apply(params, x, cfg)

    t0 = time.perf_counter()
    for _ in range(3):
        out = fwd(params, x)
        float(out[0, 0])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 48
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, x)
        if (i + 1) % 8 == 0:
            float(out[0, 0])
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    # fwd-only model FLOPs = 1/3 of the train step's 332.9 G
    mfu = ips * (332.9e9 / 3) / 197e12
    print(f"fwd-only batch={batch} impl={impl} block_q={block_q}: "
          f"{ips:.1f} img/s  mfu={mfu:.4f}  {dt * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
