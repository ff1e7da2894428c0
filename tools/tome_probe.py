"""Feasibility probe for token-reduction serving (ToMe-style): how does
the static-int8 forward scale with token count S?

Token merging removes r tokens per layer (mean count ≈ S - r·L/2); if
the step time is ~linear in S, the throughput upside is real; if fixed
overheads dominate, it is a no-go before writing any merge algorithm.
This probe truncates the token axis right after patch embed + pos embed
(constant S through the blocks — the mean-count proxy).

Stage 2: `python tools/tome_probe.py real [batch] [r1 r2 ...]` times the
REAL merge path (models/tome_forward.apply_tome, int8 static) — matching
+ gather/scatter overheads included.

Usage: python tools/tome_probe.py [batch] [S1 S2 ...]
       python tools/tome_probe.py real [batch] [r1 r2 ...] \
           [model=vit_b16|vit_l16|...] [img=384|512] [quant=static|none]

The trailing key=value args (real mode) extend the sweep beyond ViT-B
@384 (VERDICT r4 #8): ViT-L merging, @512's 1025 tokens (where token
reduction should pay MORE), and the bf16 dense+tome path (quant=none).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.models.quantized import (
        _encoder_scan,
        calibrate_vit_scales,
        quantize_vit_params,
    )
    from chestxray_vit_tpu.ops.quant import int8_matmul_static

    real = len(sys.argv) > 1 and sys.argv[1] == "real"
    args = sys.argv[2:] if real else sys.argv[1:]
    kv = dict(a.split("=", 1) for a in args if "=" in a)
    args = [a for a in args if "=" not in a]
    batch = int(args[0]) if args else 64
    seqs = [int(s) for s in args[1:]] or (
        [8, 16, 24] if real else [577, 481, 385, 289])
    variant = kv.get("model", "vit_b16")
    img = int(kv.get("img", 384))
    quant = kv.get("quant", "static") != "none"
    sched = kv.get("sched", "constant")   # constant | decreasing
    if variant != "vit_b16" or img != 384:
        from chestxray_vit_tpu.config import vit_variant_config
        cfg = vit_variant_config(variant, img_size=img)
        cfg.remat = False
        print(f"model={variant} img={img} quant={quant}", flush=True)
    else:
        cfg = ModelConfig(num_classes=15, remat=False)

    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, img, img, 3)), jnp.float32)
    scales = calibrate_vit_scales(params, x[:8], cfg)
    qp = quantize_vit_params(params, scales) if quant else params

    def fwd(qparams, images, keep):
        compute_dtype = jnp.dtype(cfg.dtype)
        patches = vit.patchify(images.astype(jnp.float32), cfg.patch_size)
        pe = qparams["patch_embed"]
        h = int8_matmul_static(patches, pe["qw"], pe["xs"], pe["bias"],
                               out_dtype=compute_dtype)
        b = h.shape[0]
        cls = jnp.broadcast_to(qparams["cls_token"].astype(compute_dtype),
                               (b, 1, cfg.hidden_size))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + qparams["pos_embed"].astype(compute_dtype)
        h = h[:, :keep]                       # the token-count proxy

        def int8_proj(y, bp, key):
            from chestxray_vit_tpu.models.quantized import _SITE_OF
            return int8_matmul_static(y, bp[key]["qw"],
                                      bp["act"][_SITE_OF[key]],
                                      bp[key]["bias"],
                                      out_dtype=compute_dtype)

        h, _ = _encoder_scan(h, qparams["blocks"], cfg, int8_proj)
        fl = qparams["final_ln"]
        h = vit.layer_norm(h, fl["scale"], fl["bias"], cfg.layernorm_eps)
        head = qparams["head"]
        return (h[:, 0, :].astype(jnp.float32)
                @ head["kernel"].astype(jnp.float32))

    if real:
        from chestxray_vit_tpu.models.quantized import apply_quantized
        from chestxray_vit_tpu.models.tome_forward import apply_tome
        for r in seqs:
            if r == 0:      # baseline row: the plain (merge-free) forward
                f = jax.jit(lambda p, im: (
                    apply_quantized(p, im, cfg) if quant
                    else vit.apply(p, im, cfg)))
            else:
                f = jax.jit(lambda p, im, r=r: apply_tome(
                    p, im, cfg, r, quantized=quant, schedule=sched))
            t0 = time.perf_counter()
            out = f(qp, x)
            float(out[0, 0])
            print(f"r={r}: compile+warmup {time.perf_counter()-t0:.0f}s",
                  flush=True)
            iters = 24
            t0 = time.perf_counter()
            for i in range(iters):
                out = f(qp, x)
                if (i + 1) % 8 == 0:
                    float(out[0, 0])
            float(out[0, 0])
            dt = (time.perf_counter() - t0) / iters
            label = "int8 static" if quant else "bf16 dense"
            if sched != "constant":
                label += f", {sched}"
            print(f"tome r={r} ({label}): {batch / dt:.1f} img/s  "
                  f"{dt * 1e3:.2f} ms", flush=True)
        return

    for s in seqs:
        f = jax.jit(fwd, static_argnums=2)
        out = f(qp, x, s)
        float(out[0, 0])
        iters = 24
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(qp, x, s)
            if (i + 1) % 8 == 0:
                float(out[0, 0])
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"S={s}: {batch / dt:.1f} img/s  {dt * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
