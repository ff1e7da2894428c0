"""Native → HF weight export (inverse of import_hf).

Lets a model fine-tuned in this framework be loaded back into HF
``ViTForImageClassification`` (torch) — the interop surface reference users
expect when switching stacks. Exact inverse of
``import_hf.params_from_hf_state_dict``'s layout transforms.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def hf_state_dict_from_params(params: Mapping[str, Any],
                              patch_size: int = 16) -> Dict[str, np.ndarray]:
    """Our pytree → HF ViTForImageClassification state dict (numpy)."""
    p = {k: np.asarray(v) for k, v in _flatten(params).items()}
    d = p["patch_embed/kernel"].shape[1]
    sd: Dict[str, np.ndarray] = {}

    conv = p["patch_embed/kernel"].reshape(patch_size, patch_size, 3, d)
    sd["vit.embeddings.patch_embeddings.projection.weight"] = \
        conv.transpose(3, 2, 0, 1)
    sd["vit.embeddings.patch_embeddings.projection.bias"] = \
        p["patch_embed/bias"]
    sd["vit.embeddings.cls_token"] = p["cls_token"]
    sd["vit.embeddings.position_embeddings"] = p["pos_embed"]
    sd["vit.layernorm.weight"] = p["final_ln/scale"]
    sd["vit.layernorm.bias"] = p["final_ln/bias"]
    sd["classifier.weight"] = p["head/kernel"].T
    sd["classifier.bias"] = p["head/bias"]

    l = p["blocks/wq/kernel"].shape[0]
    pairs = [
        ("attention.attention.query", "wq"),
        ("attention.attention.key", "wk"),
        ("attention.attention.value", "wv"),
        ("attention.output.dense", "wo"),
        ("intermediate.dense", "mlp_in"),
        ("output.dense", "mlp_out"),
    ]
    for i in range(l):
        base = f"vit.encoder.layer.{i}"
        for hf_name, ours in pairs:
            sd[f"{base}.{hf_name}.weight"] = p[f"blocks/{ours}/kernel"][i].T
            sd[f"{base}.{hf_name}.bias"] = p[f"blocks/{ours}/bias"][i]
        sd[f"{base}.layernorm_before.weight"] = p["blocks/ln1/scale"][i]
        sd[f"{base}.layernorm_before.bias"] = p["blocks/ln1/bias"][i]
        sd[f"{base}.layernorm_after.weight"] = p["blocks/ln2/scale"][i]
        sd[f"{base}.layernorm_after.bias"] = p["blocks/ln2/bias"][i]
    return sd


def save_safetensors(path: str, params: Mapping[str, Any],
                     patch_size: int = 16) -> None:
    from safetensors.numpy import save_file
    sd = {k: np.ascontiguousarray(v.astype(np.float32))
          for k, v in hf_state_dict_from_params(params, patch_size).items()}
    save_file(sd, path)


def write_preprocessor_config(directory: str, img_size: int,
                              image_mean=None, image_std=None) -> None:
    """Emit ``preprocessor_config.json`` so
    ``ViTImageProcessor.from_pretrained(directory)`` reproduces this
    framework's preprocessing (resize → 1/255 rescale → mean/std
    normalize). The reference passes ``tokenizer=processor`` to Trainer
    (pyc L465-L472; ViT-Training.py:120), so its ``save_model()`` output
    dir loads end-to-end INCLUDING preprocessing — this is the parity
    file. Defaults are the google/vit processor's 0.5/0.5 (the
    reference's effective normalization, config.PROCESSOR_MEAN note)."""
    import json
    import os

    from chestxray_vit_tpu.config import PROCESSOR_MEAN, PROCESSOR_STD

    cfg = {
        "image_processor_type": "ViTImageProcessor",
        "do_resize": True,
        "size": {"height": img_size, "width": img_size},
        "resample": 2,                      # PILImageResampling.BILINEAR
        "do_rescale": True,
        "rescale_factor": 1.0 / 255.0,
        "do_normalize": True,
        "image_mean": list(image_mean or PROCESSOR_MEAN),
        "image_std": list(image_std or PROCESSOR_STD),
    }
    path = os.path.join(os.path.expanduser(directory),
                        "preprocessor_config.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)


def export_hf_folder(directory: str, params: Mapping[str, Any], model_cfg,
                     classes=None, image_mean=None, image_std=None) -> None:
    """Write a complete ``from_pretrained``-loadable folder:
    ``model.safetensors`` + an HF ``ViTForImageClassification``
    config.json (multi-label problem type, id2label from ``classes``) +
    ``preprocessor_config.json`` (``ViTImageProcessor``-loadable)."""
    import json
    import os

    directory = os.path.expanduser(directory)
    os.makedirs(directory, exist_ok=True)
    save_safetensors(os.path.join(directory, "model.safetensors"),
                     params, model_cfg.patch_size)
    write_preprocessor_config(directory, model_cfg.img_size,
                              image_mean, image_std)
    names = (list(classes) if classes
             else [str(i) for i in range(model_cfg.num_classes)])
    hf_cfg = {
        "architectures": ["ViTForImageClassification"],
        "model_type": "vit",
        "image_size": model_cfg.img_size,
        "patch_size": model_cfg.patch_size,
        "num_channels": 3,
        "hidden_size": model_cfg.hidden_size,
        "num_hidden_layers": model_cfg.num_layers,
        "num_attention_heads": model_cfg.num_heads,
        "intermediate_size": model_cfg.mlp_dim,
        "hidden_act": "gelu",
        "layer_norm_eps": model_cfg.layernorm_eps,
        "hidden_dropout_prob": model_cfg.hidden_dropout,
        "attention_probs_dropout_prob": model_cfg.attention_dropout,
        "qkv_bias": True,
        "problem_type": "multi_label_classification",
        "id2label": {str(i): n for i, n in enumerate(names)},
        "label2id": {n: i for i, n in enumerate(names)},
    }
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out
