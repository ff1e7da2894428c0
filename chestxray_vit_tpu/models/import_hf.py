"""HF → native parameter import.

The reference loads pretrained weights via
``ViTForImageClassification.from_pretrained`` (/root/reference/ViT-Training.py:83;
pyc L381-L386). Here the same checkpoints (HF cache dirs or .safetensors
files) are converted into this framework's parameter pytree, with the
conv patch-embed kernel re-laid-out for the conv-as-matmul path.

Parity gate (SURVEY.md §7 step 4): logits from the imported tree match the
torch model bit-comparably in f32 on fixed inputs — tested in
tests/test_vit_parity.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.config import ModelConfig


def _to_np(t: Any) -> np.ndarray:
    """torch.Tensor / np.ndarray → np.ndarray (no torch import needed when
    arrays are already numpy, e.g. from safetensors.numpy)."""
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def params_from_hf_state_dict(state_dict: Mapping[str, Any],
                              cfg: ModelConfig,
                              dtype: str = "float32",
                              seed: int = 0) -> Dict[str, Any]:
    """Convert an HF ``ViTForImageClassification`` state dict to our pytree.

    Key layout relationships:
    - torch ``nn.Linear`` stores [out, in] and computes x·Wᵀ+b → transpose.
    - the patch conv kernel [out, in_c, kh, kw] is permuted to
      [kh, kw, in_c, out] then flattened to [kh*kw*in_c, out], matching
      :func:`chestxray_vit_tpu.models.vit.patchify`'s (row, col, channel)
      per-patch flatten order.
    - per-layer tensors are stacked along a leading layer axis for the
      ``lax.scan`` encoder.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    dt = np.dtype(dtype)
    g = lambda k: sd[k].astype(dt)

    d, l = cfg.hidden_size, cfg.num_layers
    conv = g("vit.embeddings.patch_embeddings.projection.weight")
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, d)

    def lin(prefix):
        # returns (stacked kernels [L, in, out], stacked biases [L, out])
        ks = [g(f"vit.encoder.layer.{i}.{prefix}.weight").T for i in range(l)]
        bs = [g(f"vit.encoder.layer.{i}.{prefix}.bias") for i in range(l)]
        return np.stack(ks), np.stack(bs)

    def ln(prefix):
        return (np.stack([g(f"vit.encoder.layer.{i}.{prefix}.weight")
                          for i in range(l)]),
                np.stack([g(f"vit.encoder.layer.{i}.{prefix}.bias")
                          for i in range(l)]))

    wq_k, wq_b = lin("attention.attention.query")
    wk_k, wk_b = lin("attention.attention.key")
    wv_k, wv_b = lin("attention.attention.value")
    wo_k, wo_b = lin("attention.output.dense")
    mi_k, mi_b = lin("intermediate.dense")
    mo_k, mo_b = lin("output.dense")
    ln1_s, ln1_b = ln("layernorm_before")
    ln2_s, ln2_b = ln("layernorm_after")

    params = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": g("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g("vit.embeddings.cls_token"),
        "pos_embed": g("vit.embeddings.position_embeddings"),
        "blocks": {
            "ln1": {"scale": ln1_s, "bias": ln1_b},
            "ln2": {"scale": ln2_s, "bias": ln2_b},
            "wq": {"kernel": wq_k, "bias": wq_b},
            "wk": {"kernel": wk_k, "bias": wk_b},
            "wv": {"kernel": wv_k, "bias": wv_b},
            "wo": {"kernel": wo_k, "bias": wo_b},
            "mlp_in": {"kernel": mi_k, "bias": mi_b},
            "mlp_out": {"kernel": mo_k, "bias": mo_b},
        },
        "final_ln": {"scale": g("vit.layernorm.weight"),
                     "bias": g("vit.layernorm.bias")},
    }
    if "classifier.weight" in sd:
        head_k = g("classifier.weight").T
        head_b = g("classifier.bias")
        if head_k.shape[1] != cfg.num_classes:
            # the reference passes ignore_mismatched_sizes=True and reinits
            # the head for its own class count (pyc L381-L386)
            head_k = None
    else:
        head_k = None
    if head_k is None:
        # HF _init_weights semantics for the fresh classifier: truncated
        # normal, std = initializer_range (0.02), zero bias — keyed by the
        # run seed so head init is reproducible and config-controlled
        init = jax.nn.initializers.truncated_normal(stddev=0.02)
        head_k = np.asarray(init(jax.random.key(seed),
                                 (d, cfg.num_classes), jnp.float32),
                            dtype=dt)
        head_b = np.zeros((cfg.num_classes,), dt)
    params["head"] = {"kernel": head_k, "bias": head_b}
    return jax.tree.map(jnp.asarray, params)


def params_from_safetensors(path: str, cfg: ModelConfig,
                            dtype: str = "float32",
                            seed: int = 0) -> Dict[str, Any]:
    """Load from a ``model.safetensors`` file (an HF snapshot dir works too)."""
    from safetensors.numpy import load_file
    if os.path.isdir(path):
        path = os.path.join(path, "model.safetensors")
    return params_from_hf_state_dict(load_file(path), cfg, dtype, seed=seed)


def load_pretrained(name_or_path: str, cfg: ModelConfig,
                    dtype: str = "float32",
                    seed: int = 0) -> Optional[Dict[str, Any]]:
    """Best-effort pretrained load: a local safetensors path, the HF cache,
    or (when the environment has network) the HF hub. Returns None when the
    weights are unreachable — callers fall back to random init, mirroring the
    reference's print-and-degrade handling of model-load failure
    (pyc L375-L396)."""
    if os.path.exists(name_or_path):
        try:
            return params_from_safetensors(name_or_path, cfg, dtype,
                                           seed=seed)
        except Exception as e:                        # noqa: BLE001
            print(f"[import_hf] local load failed: {e}")
            return None
    try:
        from transformers import ViTForImageClassification
        model = ViTForImageClassification.from_pretrained(
            name_or_path,
            num_labels=cfg.num_classes,
            ignore_mismatched_sizes=True,
        )
        return params_from_hf_state_dict(model.state_dict(), cfg, dtype,
                                         seed=seed)
    except Exception as e:                            # noqa: BLE001
        print(f"[import_hf] pretrained load failed ({e}); using random init")
        return None
