import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from chestxray_vit_tpu.config import Config, ModelConfig, TrainConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.parallel import mesh as mesh_lib
from chestxray_vit_tpu.train import steps as S
from chestxray_vit_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.xla_cache')


def run(rate, fused_qkv=False):
    cfg = Config(model=ModelConfig(num_classes=15, remat=True,
                                   attention_dropout=rate,
                                   fused_qkv=fused_qkv),
                 train=TrainConfig())
    mesh = mesh_lib.build_mesh()
    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=42)
    step = S.jit_train_step(S.make_train_step(cfg, total_steps=10_000),
                            mesh, state)
    state = S.place_state(state, mesh)
    rng = np.random.default_rng(0)
    b = 36
    batch = mesh_lib.shard_batch(mesh, {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, 384, 384, 3)), jnp.float32),
        "labels": jnp.asarray((rng.random((b, 15)) < 0.2), jnp.float32)})
    state, m = step(state, batch)
    float(m["loss"])  # compile + 1 step
    n = 48
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch)
        if (i + 1) % 16 == 0:
            float(m["loss"])
    dt = time.perf_counter() - t0
    return b * n / dt, float(m["loss"])


if __name__ == "__main__":
    rate = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    fused = len(sys.argv) > 2 and sys.argv[2] == "fused"
    ips, loss = run(rate, fused)
    print(f"rate {rate} fused_qkv={fused}: {ips:.1f} img/s "
          f"loss {loss:.4f}", flush=True)
