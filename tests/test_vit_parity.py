"""Logit-parity gate vs HF torch ViT (SURVEY.md §7 hard part 1).

Constructs torch ``ViTForImageClassification`` offline (random init — no hub
access needed), imports its state dict through
``params_from_hf_state_dict``, and requires near-bit f32 logit agreement on
fixed inputs. Covers erf-GELU, LayerNorm eps 1e-12, conv-vs-matmul
patch-embed numerics, residual structure, and CLS-head extraction."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chestxray_vit_tpu.config import ModelConfig  # noqa: E402
from chestxray_vit_tpu.models import vit  # noqa: E402
from chestxray_vit_tpu.models.import_hf import params_from_hf_state_dict  # noqa: E402


def _make_pair(cfg: ModelConfig):
    hf_cfg = transformers.ViTConfig(
        image_size=cfg.img_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.mlp_dim,
        num_labels=cfg.num_classes,
    )
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(hf_cfg).eval()
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return model, params


def _compare(cfg: ModelConfig, batch: int, atol: float):
    model, params = _make_pair(cfg)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(
        (batch, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x)).logits.numpy()
    ours = vit.apply(params, vit.nchw_to_nhwc(jnp.asarray(x)), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-4)


def test_parity_small_vit():
    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                      num_layers=3, num_heads=4, mlp_dim=128,
                      num_classes=5, dtype="float32",
                      attention_impl="xla")
    _compare(cfg, batch=4, atol=2e-5)


def test_parity_vit_base_384():
    """The real gate: full ViT-B/16 @384 (86M params, 577 tokens)."""
    cfg = ModelConfig(num_classes=15, dtype="float32", attention_impl="xla")
    _compare(cfg, batch=1, atol=1e-4)


def test_parity_param_count_matches_torch():
    cfg = ModelConfig(num_classes=15, dtype="float32")
    model, params = _make_pair(cfg)
    n_torch = sum(p.numel() for p in model.parameters())
    assert vit.num_params(params) == n_torch


def test_gradient_parity_with_torch():
    """End-to-end gradient check vs torch autograd through the whole model
    (BCE loss), covering the custom-VJP LayerNorm and flash-attention VJP
    wiring inside scan."""
    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                      num_layers=2, num_heads=4, mlp_dim=128,
                      num_classes=5, dtype="float32", attention_impl="xla")
    model, params = _make_pair(cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    y = (rng.random((2, 5)) < 0.4).astype(np.float32)

    tx = torch.from_numpy(x)
    out = model(pixel_values=tx).logits
    loss = torch.nn.BCEWithLogitsLoss()(out, torch.from_numpy(y))
    loss.backward()
    tgrads = {n: p.grad.numpy() for n, p in model.named_parameters()}

    import jax
    from chestxray_vit_tpu.train.steps import bce_with_logits

    def loss_fn(params):
        logits = vit.apply(params, vit.nchw_to_nhwc(jnp.asarray(x)), cfg)
        return bce_with_logits(logits, jnp.asarray(y))

    assert abs(float(loss_fn(params)) - float(loss)) < 1e-6
    grads = jax.grad(loss_fn)(params)

    checks = [
        (grads["head"]["kernel"], tgrads["classifier.weight"].T),
        (grads["final_ln"]["scale"], tgrads["vit.layernorm.weight"]),
        (grads["cls_token"], tgrads["vit.embeddings.cls_token"]),
        (grads["patch_embed"]["kernel"],
         tgrads["vit.embeddings.patch_embeddings.projection.weight"]
         .transpose(2, 3, 1, 0).reshape(-1, 64)),
        (grads["blocks"]["wq"]["kernel"][0],
         tgrads["vit.encoder.layer.0.attention.attention.query.weight"].T),
        (grads["blocks"]["ln1"]["scale"][1],
         tgrads["vit.encoder.layer.1.layernorm_before.weight"]),
        (grads["blocks"]["mlp_in"]["kernel"][0],
         tgrads["vit.encoder.layer.0.intermediate.dense.weight"].T),
    ]
    for ours, ref in checks:
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5,
                                   rtol=1e-4)


def test_remat_and_scan_same_logits():
    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                      num_layers=2, num_heads=4, mlp_dim=128,
                      num_classes=3, dtype="float32", attention_impl="xla")
    import jax
    params = vit.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)), jnp.float32)
    base = vit.apply(params, x, cfg)
    cfg_remat = ModelConfig(**{**cfg.__dict__, "remat": True})
    np.testing.assert_allclose(np.asarray(vit.apply(params, x, cfg_remat)),
                               np.asarray(base), atol=1e-6)


def test_attention_rollout_path_consistent():
    cfg = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                      num_layers=2, num_heads=4, mlp_dim=128,
                      num_classes=3, dtype="float32", attention_impl="xla")
    import jax
    params = vit.init_params(jax.random.key(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)), jnp.float32)
    logits, probs = vit.apply_with_attention(params, x, cfg)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(vit.apply(params, x, cfg)),
                               atol=1e-5)
    assert probs.shape == (2, 2, 4, cfg.seq_len, cfg.seq_len)
    # attention rows are probability distributions
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_attention_dropout_perturbs_training_forward(rng):
    """ModelConfig.attention_dropout must actually do something: with a
    rate set and train=True, activations differ from the 0.0 config; with
    train=False it is inert (HF ViTSelfAttention dropout semantics)."""
    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit as V

    cfg0 = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                       num_layers=2, num_heads=4, mlp_dim=128,
                       num_classes=5, dtype="float32",
                       attention_impl="xla")
    cfg_drop = ModelConfig(**{**cfg0.__dict__, "attention_dropout": 0.5})
    params = V.init_params(jax.random.key(0), cfg0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    key = jax.random.key(7)
    base = V.apply(params, x, cfg0, train=True, rng=key)
    dropped = V.apply(params, x, cfg_drop, train=True, rng=key)
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
    # inert at eval time
    e0 = V.apply(params, x, cfg0, train=False)
    e1 = V.apply(params, x, cfg_drop, train=False)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_train_bf16_knob_downgrades_dtype(tmp_path):
    """TrainConfig.bf16=False (the reference's TrainingArguments switch)
    must actually select f32 compute."""
    from chestxray_vit_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from chestxray_vit_tpu.data.testing import build_fake_nih
    from chestxray_vit_tpu.train.trainer import Trainer

    fake = build_fake_nih(num_images=30, image_size=64, seed=2)
    cfg = Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=1, num_heads=4, mlp_dim=64,
                          attention_impl="xla"),
        train=TrainConfig(bf16=False, output_dir=str(tmp_path / "o"),
                          report_to="none"))
    assert cfg.model.dtype == "bfloat16"
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    assert cfg.model.dtype == "float32"
    tr.close()


def test_gelu_approximate_knob(rng):
    """gelu_approximate=True switches to tanh GELU (perf knob); default
    False keeps HF's exact erf (the parity tests above pin it)."""
    from chestxray_vit_tpu.config import ModelConfig
    from chestxray_vit_tpu.models import vit as V

    base = ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                       num_layers=2, num_heads=4, mlp_dim=128,
                       num_classes=5, dtype="float32", attention_impl="xla")
    fast = ModelConfig(**{**base.__dict__, "gelu_approximate": True})
    params = V.init_params(jax.random.key(1), base)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    exact = np.asarray(V.apply(params, x, base))
    approx = np.asarray(V.apply(params, x, fast))
    assert not np.array_equal(exact, approx)
    np.testing.assert_allclose(exact, approx, atol=0.15)  # close, not equal
