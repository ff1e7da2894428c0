"""Regenerate tests/golden_run.json (the golden-run regression pins).

Run on the virtual CPU mesh (same environment as the test suite):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/make_golden.py

Only regenerate after an INTENTIONAL numerics change; commit the diff with
a message saying what moved the trajectory.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    import pathlib

    from tests.test_golden_run import _agreement_stats, _run

    with tempfile.TemporaryDirectory() as td:
        losses, ev, tr = _run(pathlib.Path(td), keep_trainer=True)
        agreement = _agreement_stats(tr)
        tr.close()
    with tempfile.TemporaryDirectory() as td:
        tome_losses, tome_ev = _run(pathlib.Path(td), tome_r=2)
    with tempfile.TemporaryDirectory() as td:
        dec_losses, dec_ev = _run(pathlib.Path(td), tome_r=2,
                                  tome_schedule="decreasing")
    with tempfile.TemporaryDirectory() as td:
        deep_losses, deep_ev = _run(pathlib.Path(td), tome_r=1,
                                    tome_schedule="decreasing",
                                    num_layers=32)
    out = {"losses": losses, "avg_auroc": ev["avg_auroc"],
           "eval_loss": ev["eval_loss"],
           "tome_losses": tome_losses,
           "tome_avg_auroc": tome_ev["avg_auroc"],
           "tome_eval_loss": tome_ev["eval_loss"],
           "tome_dec_losses": dec_losses,
           "tome_dec_avg_auroc": dec_ev["avg_auroc"],
           "tome_dec_eval_loss": dec_ev["eval_loss"],
           "deep_losses": deep_losses,
           "deep_avg_auroc": deep_ev["avg_auroc"],
           "deep_eval_loss": deep_ev["eval_loss"],
           "agreement": agreement}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_run.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps(out)[:200])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
