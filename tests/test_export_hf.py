"""Export roundtrip: our params → HF state dict → torch model → logits
match; and import(export(x)) == x."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chestxray_vit_tpu.config import ModelConfig  # noqa: E402
from chestxray_vit_tpu.models import vit  # noqa: E402
from chestxray_vit_tpu.models.export_hf import (  # noqa: E402
    hf_state_dict_from_params,
    save_safetensors,
)
from chestxray_vit_tpu.models.import_hf import (  # noqa: E402
    params_from_hf_state_dict,
    params_from_safetensors,
)

CFG = ModelConfig(img_size=32, patch_size=16, hidden_size=64, num_layers=2,
                  num_heads=4, mlp_dim=128, num_classes=5, dtype="float32",
                  attention_impl="xla")


def test_export_roundtrip_identity():
    params = vit.init_params(jax.random.key(0), CFG)
    sd = hf_state_dict_from_params(params, CFG.patch_size)
    back = params_from_hf_state_dict(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_exported_weights_match_in_torch(rng):
    params = vit.init_params(jax.random.key(1), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in hf_state_dict_from_params(params,
                                                CFG.patch_size).items()}
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, num_labels=5)
    model = transformers.ViTForImageClassification(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(sd, strict=True), None
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x)).logits.numpy()
    ours = vit.apply(params, vit.nchw_to_nhwc(jnp.asarray(x)), CFG)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_safetensors_file_roundtrip(tmp_path):
    params = vit.init_params(jax.random.key(2), CFG)
    path = str(tmp_path / "model.safetensors")
    save_safetensors(path, params, CFG.patch_size)
    back = params_from_safetensors(path, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
