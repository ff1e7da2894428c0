"""Serving-path probe: single-image latency + batched throughput on chip.

Usage: python tools/serve_probe.py [batch_size] [iters] [placement]

Measures the Predictor end-to-end (PNG bytes → decode → staged canvases →
jitted fused-preprocess + ViT forward → probabilities): cold-ish p50/p95
single-image latency through the MicroBatcher and steady-state batched
throughput. Timing uses wall clock around the full call (the scalar results
force device completion — the honest sync on this platform, BENCH_NOTES.md).
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.serve.batcher import MicroBatcher
    from chestxray_vit_tpu.serve.inference import Predictor
    from chestxray_vit_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache"))

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    placement = sys.argv[3] if len(sys.argv) > 3 else "host"

    from PIL import Image
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:1024, 0:1024]
    img = np.clip((np.sin(yy / 60) + np.cos(xx / 45)) * 60 + 120 +
                  rng.normal(0, 12, (1024, 1024)), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()

    cfg = ModelConfig(num_classes=15)
    params = vit.init_params(jax.random.key(0), cfg)
    pred = Predictor(params, cfg, batch_size=batch_size,
                     placement=placement)
    print(f"placement={placement}", flush=True)

    # warmup/compile (all batch buckets)
    t0 = time.perf_counter()
    pred.warmup()
    pred.predict_bytes([png] * batch_size)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    # batched throughput
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pred.predict_bytes([png] * batch_size)
    dt = (time.perf_counter() - t0) / iters
    assert out.probs.shape == (batch_size, 15)
    print(f"batched: {batch_size / dt:.1f} img/s (batch {batch_size}, "
          f"{dt * 1e3:.1f} ms/batch)")

    # single-image latency through the micro-batcher
    mb = MicroBatcher(pred, max_wait_ms=2.0)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        mb.predict(png)
        lat.append(time.perf_counter() - t0)
    mb.close()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    print(f"single-image latency: p50 {lat_ms[len(lat_ms) // 2]:.1f} ms  "
          f"p95 {lat_ms[int(len(lat_ms) * 0.95)]:.1f} ms")


if __name__ == "__main__":
    main()
