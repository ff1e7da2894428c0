"""Headline benchmark: ViT-B/16 @384 fine-tune throughput (images/sec/chip).

Runs the full jitted train step (forward + backward + AdamW, bf16 activations,
Pallas flash attention) on whatever devices JAX exposes and prints ONE JSON
line. The reference (torch_xla HF Trainer, SURVEY.md §6) publishes no
numbers; BASELINE.json's north-star is ≥3× the torch-xla reference's
images/sec/chip. ``vs_baseline`` divides by a MEASURED naive baseline:
the reference's own configuration (batch 8/core, bf16, stock XLA einsum
attention, no remat, per-step sync) run on this same chip via
tools/naive_baseline.py — 71.4 img/s/chip. That denominator is
conservative for the north star (a whole-graph jit is faster than
torch-xla's lazy-tensor + HF-Trainer loop it stands in for); the older
60 img/s torch-xla estimate is retired to BENCH_NOTES.md.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# The TPU on this machine is reached through a tunneled PJRT plugin that
# can wedge for hours (dispatch hangs; even ``jax.devices()`` may hang —
# CLAUDE.md "Platform gotchas"). The benchmark therefore runs in two
# layers: a supervisor (default entry) that probes chip liveness in a
# SUBPROCESS with a hard timeout and retries within a bounded window, and
# the actual benchmark (``--run``), also executed as a timed subprocess so
# a mid-run wedge cannot hang the driver. The supervisor re-prints the
# child's single JSON line; on an exhausted window it exits non-zero with
# a clear "tunnel down" message instead of crashing with a raw traceback
# (round-3 failure mode: BENCH_r03.json rc=1).
_PROBE_SRC = (
    "import os, jax, jax.numpy as jnp;"
    # the machine's PJRT site hook overrides JAX_PLATFORMS via
    # jax.config at interpreter start — re-assert the env var so
    # CPU-platform runs of the bench actually stay on CPU
    "p = os.environ.get('JAX_PLATFORMS');"
    "p and jax.config.update('jax_platforms', p);"
    "x = jnp.ones((256, 256));"
    "print('ALIVE', float((x @ x)[0, 0]))"
)
_PROBE_TIMEOUT_S = 150       # backend init + tiny compile, generous
_RUN_TIMEOUT_S = 2400        # cold compile is ~3 min; wedges hang forever
_RETRY_WINDOW_S = float(os.environ.get("CXR_BENCH_RETRY_S", 900))
_RETRY_SLEEP_S = 60


def _probe_alive() -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True,
                           timeout=_PROBE_TIMEOUT_S)
        return r.returncode == 0 and "ALIVE" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def supervise(argv: list) -> int:
    deadline = time.monotonic() + _RETRY_WINDOW_S
    attempt = 0
    child_failed_while_alive = False   # sticky across attempts
    while True:
        attempt += 1
        probe_ok = _probe_alive()
        if probe_ok:
            cmd = [sys.executable, os.path.abspath(__file__), "--run"] + argv
            try:
                r = subprocess.run(cmd, stdout=subprocess.PIPE, text=True,
                                   timeout=_RUN_TIMEOUT_S)
            except subprocess.TimeoutExpired:
                print(f"bench: run timed out after {_RUN_TIMEOUT_S}s "
                      "(tunnel wedged mid-run)", file=sys.stderr)
                r = None
                child_failed_while_alive = True   # probe passed this attempt
            if r is not None and r.returncode == 0:
                # Contract: exactly one JSON line on stdout.
                for line in r.stdout.splitlines():
                    if line.startswith("{"):
                        print(line)
                        return 0
                print("bench: child produced no JSON line", file=sys.stderr)
                child_failed_while_alive = True
            elif r is not None:
                print(f"bench: run failed rc={r.returncode}",
                      file=sys.stderr)
                child_failed_while_alive = True
        else:
            print(f"bench: liveness probe {attempt} failed "
                  "(tiny matmul did not complete)", file=sys.stderr)
        if time.monotonic() >= deadline:
            if child_failed_while_alive:
                # At least once the chip answered the tiny-matmul probe but
                # the benchmark child still failed: that is NOT the tunnel
                # wedge — the child's output is on stderr above. Sticky so a
                # transient probe blip on the final attempt can't relabel a
                # framework error as a tunnel problem.
                print("bench: benchmark child failed while the liveness "
                      "probe passed — see the child output above "
                      "(framework error or mid-run wedge), not the "
                      "documented full-tunnel wedge.", file=sys.stderr)
                return 3
            print("bench: TPU tunnel down — liveness probe / run failed for "
                  f"{_RETRY_WINDOW_S:.0f}s. This is the documented tunnel "
                  "wedge (CLAUDE.md 'Platform gotchas'), not a framework "
                  "error. Re-run when the tunnel recovers.", file=sys.stderr)
            return 2
        time.sleep(_RETRY_SLEEP_S)


def main() -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        # see _PROBE_SRC: the site hook overrides the env var
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from chestxray_vit_tpu.config import Config, ModelConfig, TrainConfig
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.parallel import mesh as mesh_lib
    from chestxray_vit_tpu.train import steps as S

    from chestxray_vit_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".xla_cache"))

    n_chips = len(jax.devices())
    args = [a for a in sys.argv[1:] if a != "--run"]
    batch_per_chip = int(args[0]) if args else 36
    # batch 36/chip with scan rematerialization + the round-2 Pallas flash
    # kernels is the measured sweet spot on v5e (swept 8..64: 36 -> 233
    # img/s vs 222 at 64 — see BENCH_NOTES.md).
    cfg = Config(model=ModelConfig(num_classes=15, remat=batch_per_chip > 32),
                 train=TrainConfig())

    mesh = mesh_lib.build_mesh()

    rng = np.random.default_rng(0)
    b = batch_per_chip * n_chips
    batch = mesh_lib.shard_batch(mesh, {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, 384, 384, 3)), jnp.float32),
        "labels": jnp.asarray((rng.random((b, 15)) < 0.2), jnp.float32),
    })

    def time_step(step_cfg: Config) -> float:
        """img/s/chip for one train-step config, shared timing discipline.

        Fresh params per config: the jitted step donates its state, so a
        reused host tree raises "Array has been deleted" on real devices
        (donation is a no-op on CPU — only chip runs catch aliasing).

        Sync via a scalar host transfer — on this machine's tunneled PJRT
        platform block_until_ready returns without waiting and deep async
        queues run pathologically slowly, so scalar sync is both the only
        honest timing and the fast execution mode. Shallow pipelining:
        sync every 16 steps (measured safe; overlaps the ~33 ms dispatch
        round-trip; real training syncs at logging steps anyway). See
        BENCH_NOTES.md.
        """
        params = vit.init_params(jax.random.key(0), step_cfg.model)
        state = S.place_state(S.TrainState.create(params, seed=42), mesh)
        step = S.jit_train_step(
            S.make_train_step(step_cfg, total_steps=10_000), mesh, state)
        for _ in range(3):
            state, m = step(state, batch)
            float(m["loss"])
        iters = 32
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch)
            if (i + 1) % 16 == 0:
                float(m["loss"])
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        return b / dt / n_chips

    img_per_sec_chip = time_step(cfg)

    # Secondary driver-captured numbers, extra fields on the SAME single
    # JSON line (contract preserved): the accelerated train steps.
    # (a) model.tome_r=16 — differentiable token merging at the paper's
    #     validated quality point (arXiv:2210.09461).
    tome16_img_per_sec_chip = time_step(Config(
        model=ModelConfig(num_classes=15, remat=batch_per_chip > 32,
                          tome_r=16),
        train=TrainConfig()))
    # (b) the best measured recipe: r=32 with the decreasing schedule
    #     (front-loaded merge budget — BENCH_NOTES "tome_schedule=
    #     decreasing"; fidelity is the user's tradeoff, gated by
    #     examples/finetune_nih.py --expect-tome-band on real data).
    tome32d_img_per_sec_chip = time_step(Config(
        model=ModelConfig(num_classes=15, remat=batch_per_chip > 32,
                          tome_r=32, tome_schedule="decreasing"),
        train=TrainConfig()))
    # Measured on this chip: the reference's configuration translated
    # literally (batch 8/core, stock XLA attention, no remat, per-step
    # sync) — tools/naive_baseline.py, 2026-08-16. See BENCH_NOTES.md.
    naive_baseline = 71.4
    # MFU: absolute accounting independent of the baseline estimate
    # (analytic model shared with the Trainer's live logging, utils/flops).
    from chestxray_vit_tpu.utils import flops as F
    peak = F.chip_peak_flops()
    flops_img = F.model_flops_per_image(cfg.model)
    print(json.dumps({
        "metric": "images/sec/chip (ViT-B/16 @384 fine-tune step, bf16)",
        "value": round(img_per_sec_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_chip / naive_baseline, 2),
        "mfu": round(img_per_sec_chip * flops_img / peak, 4),
        "flops_per_image": round(flops_img / 1e9, 1),
        "chip_peak_tflops": round(peak / 1e12, 0),
        "device_kind": jax.devices()[0].device_kind,
        # accelerated train step (model.tome_r=16): same metric, the
        # opt-in token-merging recipe (golden-run fidelity gate in tests)
        "tome16_value": round(tome16_img_per_sec_chip, 2),
        "tome16_vs_baseline": round(tome16_img_per_sec_chip /
                                    naive_baseline, 2),
        # best measured train recipe (tome_r=32, decreasing schedule)
        "tome32dec_value": round(tome32d_img_per_sec_chip, 2),
        "tome32dec_vs_baseline": round(tome32d_img_per_sec_chip /
                                       naive_baseline, 2),
    }))


if __name__ == "__main__":
    if "--run" in sys.argv[1:]:
        main()
    else:
        sys.exit(supervise(sys.argv[1:]))
