"""int8-quantized ViT forward for serving (beyond-parity inference path).

Mirrors :func:`vit.apply`'s architecture exactly (pre-LN blocks, flash
attention, erf GELU, CLS head — reference model per ViT-Training.py:83 /
pyc L381) but runs every large matmul on the int8 MXU path at 2× bf16
peak: per-output-channel int8 weights prepared once at load
(:func:`quantize_vit_params`), per-token dynamic activation scales, int32
accumulation (``ops/quant.py``). Attention stays bf16 in the Pallas
kernel (it is VPU-bound, not MXU-bound, at ViT head_dim); LayerNorm,
softmax and the classifier head stay f32.

Forward-only by design — training remains bf16/f32 master-weight.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.config import ModelConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.ops.gelu import gelu as _gelu
from chestxray_vit_tpu.ops.quant import (
    QuantizedWeight,
    int8_matmul,
    quantize_weight,
)

Params = Dict[str, Any]

_QUANT_BLOCK_KEYS = ("wq", "wk", "wv", "wo", "mlp_in", "mlp_out")


def quantize_vit_params(params: Params) -> Params:
    """f32 training params → serving tree with int8 kernels.

    Block kernels are scan-stacked [L, in, out]; quantization vmaps over
    the layer axis so the quantized forward keeps the same single-trace
    ``lax.scan`` structure."""
    blocks = params["blocks"]
    qblocks: Dict[str, Any] = {
        "ln1": blocks["ln1"], "ln2": blocks["ln2"],
    }
    for key in _QUANT_BLOCK_KEYS:
        qblocks[key] = {
            "qw": jax.vmap(quantize_weight)(
                blocks[key]["kernel"].astype(jnp.float32)),
            "bias": blocks[key]["bias"],
        }
    return {
        "patch_embed": {
            "qw": quantize_weight(
                params["patch_embed"]["kernel"].astype(jnp.float32)),
            "bias": params["patch_embed"]["bias"],
        },
        "cls_token": params["cls_token"],
        "pos_embed": params["pos_embed"],
        "blocks": qblocks,
        "final_ln": params["final_ln"],
        "head": params["head"],
    }


def apply_quantized(qparams: Params, images: jax.Array,
                    cfg: ModelConfig) -> jax.Array:
    """int8 forward: NHWC images → f32 logits [B, num_classes]."""
    compute_dtype = jnp.dtype(cfg.dtype)
    h, hd = cfg.num_heads, cfg.head_dim

    patches = vit.patchify(images.astype(jnp.float32), cfg.patch_size)
    pe = qparams["patch_embed"]
    x = int8_matmul(patches, pe["qw"], pe["bias"], out_dtype=compute_dtype)
    b = x.shape[0]
    cls = jnp.broadcast_to(qparams["cls_token"].astype(compute_dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qparams["pos_embed"].astype(compute_dtype)

    def proj(y, bp_entry):
        return int8_matmul(y, bp_entry["qw"], bp_entry["bias"],
                           out_dtype=compute_dtype)

    def heads(y):                        # [B, S, D] → [B, H, S, hd]
        bsz, s, d = y.shape
        return y.reshape(bsz, s, h, hd).transpose(0, 2, 1, 3)

    def body(x, bp):
        a_in = vit.layer_norm(x, bp["ln1"]["scale"], bp["ln1"]["bias"],
                              cfg.layernorm_eps)
        q = heads(proj(a_in, bp["wq"]))
        k = heads(proj(a_in, bp["wk"]))
        v = heads(proj(a_in, bp["wv"]))
        from chestxray_vit_tpu.ops.flash_attention import attention
        o = attention(q, k, v, impl=cfg.attention_impl, inference=True)
        bsz, _, s, _ = o.shape
        merged = o.transpose(0, 2, 1, 3).reshape(bsz, s, h * hd)
        x = x + proj(merged, bp["wo"])
        m_in = vit.layer_norm(x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                              cfg.layernorm_eps)
        mid = _gelu(proj(m_in, bp["mlp_in"]),
                    approximate=cfg.gelu_approximate)
        x = x + proj(mid, bp["mlp_out"])
        return x, None

    x, _ = jax.lax.scan(body, x, qparams["blocks"])

    fl = qparams["final_ln"]
    x = vit.layer_norm(x, fl["scale"], fl["bias"], cfg.layernorm_eps)
    head = qparams["head"]
    return (jnp.dot(x[:, 0, :].astype(jnp.float32),
                    head["kernel"].astype(jnp.float32))
            + head["bias"].astype(jnp.float32))
