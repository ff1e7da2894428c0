"""END-TO-END serving measurement at the accelerated configs (VERDICT r3
next #7): HTTP server + MicroBatcher under concurrent clients, cold-start
compile cost, and the host-decode / dispatch / device-forward
decomposition — the numbers the 928/1188 img/s device-forward rows do NOT
give.

Usage:
    python tools/serve_e2e_probe.py [quantize] [tome_r] [clients] \
        [requests] [batch_size] [cache]

  quantize    none | static | dynamic        (default none)
  tome_r      token-merge r, 0 = off         (default 0)
  clients     concurrent HTTP client threads (default 8)
  requests    total requests                 (default 160)
  batch_size  predictor batch                (default 8)
  cache       1 = persistent XLA compile cache, 0 = cold (default 1)

Timing: wall clock around full calls; scalar results force device
completion (BENCH_NOTES.md discipline).
"""

import io
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.serve.inference import Predictor
    from chestxray_vit_tpu.serve.server import serve

    quantize = sys.argv[1] if len(sys.argv) > 1 else "none"
    tome_r = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    clients = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    requests = int(sys.argv[4]) if len(sys.argv) > 4 else 160
    batch_size = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    use_cache = (sys.argv[6] if len(sys.argv) > 6 else "1") == "1"

    if use_cache:
        from chestxray_vit_tpu.utils.compilation_cache import (
            enable_compilation_cache)
        enable_compilation_cache(os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), ".xla_cache"))

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

    qmode = None if quantize == "none" else quantize
    cal = "synthetic" if qmode == "static" else None
    t0 = time.perf_counter()
    pred = Predictor(params, cfg, batch_size=batch_size, quantize=qmode,
                     tome_r=tome_r, calibration=cal)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pred.warmup()
    warm_s = time.perf_counter() - t0
    from chestxray_vit_tpu.data import decode as dec
    pipelined = os.environ.get("CXR_SERVE_PIPELINE", "1") != "0"
    print(f"config: quantize={quantize} tome_r={tome_r} "
          f"batch={batch_size} cache={'on' if use_cache else 'OFF'} "
          f"decode={'native' if dec.native_available() else 'PIL'} "
          f"pipeline={'on' if pipelined else 'off'} "
          f"pulls={1 if getattr(Predictor, 'SINGLE_PULL', False) else 2}")
    print(f"cold start: build {build_s:.1f}s + warmup(compile all "
          f"buckets) {warm_s:.1f}s", flush=True)

    # ---- decomposition at full batch -------------------------------
    import jax.numpy as jnp
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        staged = pred._stage([png] * batch_size, 0)
    stage_ms = (time.perf_counter() - t0) / iters * 1e3
    staged_dev = tuple(jnp.asarray(a) for a in staged)
    # single-pull forward returns the logits array; pull the WHOLE batch
    # (indexing [0] would time a row-0 pull — same round-trip latency,
    # but not the transfer the label claims)
    np.asarray(pred._forward(pred._fwd_params, *staged_dev))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(pred._forward(pred._fwd_params, *staged_dev))
    fwd_ms = (time.perf_counter() - t0) / iters * 1e3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pred.predict_bytes([png] * batch_size)
    full_ms = (time.perf_counter() - t0) / iters * 1e3
    assert out.probs.shape == (batch_size, 15)
    print(f"decomposition/batch{batch_size}: host stage {stage_ms:.1f} ms, "
          f"device fwd+pull {fwd_ms:.1f} ms, full predict {full_ms:.1f} ms "
          f"(dispatch+overlap {full_ms - stage_ms - fwd_ms:+.1f})")
    print(f"batched: {batch_size / full_ms * 1e3:.1f} img/s", flush=True)

    # ---- served e2e under concurrent clients -----------------------
    server = serve(pred, port=0, block=False)
    port = server.server_port
    import http.client
    lat, lock = [], threading.Lock()
    per_client = requests // clients

    def client():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        mine = []
        for _ in range(per_client):
            t0 = time.perf_counter()
            conn.request("POST", "/predict", body=png,
                         headers={"Content-Type": "image/png"})
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 200, resp.status
            mine.append(time.perf_counter() - t0)
        conn.close()
        with lock:
            lat.extend(mine)

    # warm the server path once
    client_threads = [threading.Thread(target=client)
                      for _ in range(clients)]
    t0 = time.perf_counter()
    for t in client_threads:
        t.start()
    for t in client_threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    n = len(lat_ms)
    print(f"served e2e ({clients} clients × {per_client}): "
          f"{n / wall:.1f} req/s, latency p50 {lat_ms[n // 2]:.1f} / "
          f"p95 {lat_ms[int(n * 0.95)]:.1f} ms")


if __name__ == "__main__":
    main()
