"""Observability tests: metric fan-out, results files, throughput meter."""

import json
import os
import time

from chestxray_vit_tpu.utils.logging import MetricLogger, ThroughputMeter


def test_metric_logger_jsonl_and_results(tmp_path, capsys):
    lg = MetricLogger(str(tmp_path), report_to="none")
    lg.log(10, {"loss": 0.5, "lr": 1e-4})
    lg.log(20, {"avg_auroc": 0.8}, prefix="eval")
    path = lg.save_results("eval", {"avg_auroc": 0.8, "f1_micro": 0.3})
    lg.close()

    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0] == {"step": 10, "prefix": "train", "loss": 0.5,
                        "lr": 1e-4}
    assert lines[1]["prefix"] == "eval"
    assert json.load(open(path)) == {"avg_auroc": 0.8, "f1_micro": 0.3}
    out = capsys.readouterr().out
    assert "[train step 10]" in out and "loss=0.5" in out


def test_metric_logger_tensorboard(tmp_path):
    lg = MetricLogger(str(tmp_path), report_to="tensorboard")
    lg.log(1, {"loss": 1.0})
    lg.close()
    tb_files = []
    for root, _dirs, files in os.walk(tmp_path / "tb"):
        tb_files += files
    assert any("tfevents" in f for f in tb_files)


def test_throughput_meter_rate():
    m = ThroughputMeter(window=2)
    m.step(10)                  # sets t0
    time.sleep(0.05)
    m.step(10)
    time.sleep(0.05)
    m.step(10)                  # window reached → rate computed
    assert m.images_per_sec > 0
    # ~20 images over ~0.1s → ~200/s, generous bounds for CI noise
    assert 50 < m.images_per_sec < 2000


def test_import_package_lazy_api():
    import chestxray_vit_tpu as cx
    assert callable(cx.build_mesh)
    assert cx.Trainer.__name__ == "Trainer"
    assert cx.Predictor.__name__ == "Predictor"
    try:
        cx.nonexistent_thing
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
