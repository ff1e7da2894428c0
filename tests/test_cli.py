"""CLI surface tests: train / eval / predict / smoke via main() with the
in-memory backend (the outermost user surface). One shared training run."""

import json

import pytest

from chestxray_vit_tpu.cli import main

TINY = [
    "--set", "data.backend=memory",
    "--set", "model.img_size=64",
    "--set", "model.patch_size=16",
    "--set", "model.hidden_size=64",
    "--set", "model.num_layers=2",
    "--set", "model.num_heads=4",
    "--set", "model.mlp_dim=128",
    "--set", "model.dtype=float32",
    "--set", "model.attention_impl=xla",
    "--set", "train.batch_size_per_core=2",
    "--set", "train.max_steps=3",
    "--set", "train.eval_strategy=no",
    "--set", "train.save_strategy=steps",
    "--set", "train.save_steps=2",
    "--set", "train.logging_steps=1",
    "--set", "train.report_to=none",
    "--set", "train.load_best_model_at_end=false",
]


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory, capsys_disabled=None):
    out = tmp_path_factory.mktemp("cli") / "out"
    rc = main(["train", *TINY, "--set", f"train.output_dir={out}"])
    assert rc == 0
    return out


def test_cli_train_writes_artifacts(trained_dir):
    assert (trained_dir / "model" / "classes.json").exists()
    assert (trained_dir / "train_results.json").exists()
    assert (trained_dir / "eval_results.json").exists()
    ev = json.loads((trained_dir / "eval_results.json").read_text())
    assert "avg_auroc" in ev


def test_cli_eval_from_checkpoint(trained_dir, capsys):
    rc = main(["eval", *TINY, "--set", f"train.output_dir={trained_dir}",
               "--set", "train.resume_from_checkpoint=auto"])
    assert rc == 0
    assert "avg_auroc" in capsys.readouterr().out


def test_cli_predict_writes_report(trained_dir):
    rc = main(["predict", *TINY, "--set", f"train.output_dir={trained_dir}",
               "--set", "train.resume_from_checkpoint=auto"])
    assert rc == 0
    report = trained_dir / "final_classification_report.txt"
    assert report.exists()
    text = report.read_text()
    assert "precision" in text and "samples avg" in text


def test_cli_unknown_command(capsys):
    assert main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().out


def test_cli_help():
    assert main([]) == 0
    assert main(["--help"]) == 0


def test_cli_serve_routing():
    """`cli serve` forwards to the HTTP server's own flag surface."""
    import pytest as _pytest
    from chestxray_vit_tpu import cli
    with _pytest.raises(SystemExit):          # argparse: --model-dir required
        cli.main(["serve"])


def test_cli_maps_writes_overlays(trained_dir, tmp_path, capsys):
    """`maps` renders attention-rollout overlays for a saved model
    (reference README TODO 'attention map visualization', CLI form)."""
    import io
    import numpy as np
    from PIL import Image
    img_path = tmp_path / "xray.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 80), np.uint8), "L").save(
        img_path)
    out_dir = tmp_path / "overlays"
    rc = main(["maps", str(img_path),
               "--model-dir", str(trained_dir / "model"),
               "--out-dir", str(out_dir)])
    assert rc == 0
    dest = out_dir / "xray_attn.png"
    assert dest.exists()
    overlay = np.asarray(Image.open(dest))
    assert overlay.shape == (96, 80, 3)
    assert "top:" in capsys.readouterr().out


def test_render_overlay_blend():
    import numpy as np
    from chestxray_vit_tpu.serve.attention_maps import render_overlay
    gray = np.full((64, 48), 100, np.uint8)
    m = np.zeros((4, 4), np.float32)
    m[1, 1] = 1.0
    out = render_overlay(gray, m, alpha=0.5)
    assert out.shape == (64, 48, 3)
    assert out.dtype == np.uint8
    # red channel exceeds blue where attention is high; equal where zero
    hot = out[16, 12]            # near the peak cell
    cold = out[60, 44]
    assert hot[0] > hot[2]
    assert cold[0] == cold[2]


def test_cli_export_hf_folder(trained_dir, tmp_path):
    """`export` writes a from_pretrained-loadable HF folder whose torch
    model reproduces our logits on a fixed input."""
    out = tmp_path / "hf_export"
    rc = main(["export", "--model-dir", str(trained_dir / "model"),
               "--out", str(out)])
    assert rc == 0
    assert (out / "model.safetensors").exists()
    cfg_json = json.loads((out / "config.json").read_text())
    assert cfg_json["architectures"] == ["ViTForImageClassification"]
    assert cfg_json["problem_type"] == "multi_label_classification"

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import numpy as np
    hf = transformers.ViTForImageClassification.from_pretrained(str(out))
    hf.eval()

    import jax
    from chestxray_vit_tpu.config import Config
    from chestxray_vit_tpu.models import vit
    from chestxray_vit_tpu.train.checkpoint import load_model
    cfg = Config.from_json((trained_dir / "model" / "config.json")
                           .read_text())
    template = vit.init_params(jax.random.key(0), cfg.model)
    params, classes = load_model(str(trained_dir / "model"), template)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (2, cfg.model.img_size, cfg.model.img_size, 3)).astype(np.float32)
    ours = np.asarray(vit.apply(params, x, cfg.model))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
    assert cfg_json["id2label"]["0"] == classes[0]


def test_cli_maps_gradcam(trained_dir, tmp_path):
    """`maps --method gradcam` renders class-discriminative overlays."""
    import numpy as np
    from PIL import Image
    img_path = tmp_path / "gc.png"
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (64, 64), np.uint8), "L").save(
        img_path)
    out_dir = tmp_path / "gc_overlays"
    rc = main(["maps", str(img_path),
               "--model-dir", str(trained_dir / "model"),
               "--out-dir", str(out_dir), "--method", "gradcam"])
    assert rc == 0
    overlay = np.asarray(Image.open(out_dir / "gc_attn.png"))
    assert overlay.shape == (64, 64, 3)
