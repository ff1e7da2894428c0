"""Mosaic (Pallas) int8 matmul with a fused serving epilogue.

XLA lowers ``lax.dot_general(int8, int8, preferred_element_type=int32)``
to the double-rate MXU path at ~200 TFLOP/s on this chip; the same
contraction as a Pallas kernel sustains ~226 TFLOP/s (+13%, measured —
tools/mosaic_int8_probe.py, including the dequant epilogue). This module
is that kernel, with the *whole* static-int8 serving epilogue fused so
HBM traffic is no worse than XLA's fusion of the surrounding ops:

- int32 accumulator → per-output-channel dequant scale → bias;
- optional residual add (the transformer skip connection);
- optional exact-erf GELU (`ops/gelu.py` math, inlined in f32);
- optional re-quantize to int8 with the next matmul's static activation
  scale (so the MLP hidden activation crosses HBM once, as int8).

Used by :func:`models.quantized.apply_quantized` when
``backend="pallas"`` (static scales only — the dynamic path's per-row
amax epilogue is the reason dynamic loses end-to-end; see
BENCH_NOTES.md "Round 3: int8"). Inputs arrive pre-quantized int8: the
``clip(round(x / scale))`` producer step is pure elementwise and XLA
fuses it into the preceding LayerNorm, exactly as on the XLA int8 path.

Blocking: serving activations are ``[B, S, K]`` with S = 577 (prime — a
row-block grid cannot tile B·S evenly), so the grid is one step per
image with the full S×K panel as the block; block dims equal to array
dims are always legal, and Mosaic pads the 577-row sublane dimension
internally. Weights stay resident across grid steps (constant index
map). The reference has no quantization story (serving is its README
TODO); this is a beyond-parity path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chestxray_vit_tpu.ops.gelu import erf_fast

_INV_SQRT2 = 0.7071067811865476


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, w_ref, sb_ref, *rest, gelu: bool, quant: bool,
            resid: bool):
    if resid:
        resid_ref, o_ref = rest[0], rest[-1]
    else:
        o_ref = rest[-1]
    if quant:
        qs_ref = rest[-2] if not resid else rest[1]
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sb_ref[0] + sb_ref[1]
    if gelu:
        y = y * 0.5 * (1.0 + erf_fast(y * _INV_SQRT2))
    if resid:
        y = y + resid_ref[0].astype(jnp.float32)
    if quant:
        inv = 1.0 / qs_ref[0]
        y = jnp.clip(jnp.round(y * inv), -127.0, 127.0)
        o_ref[0] = y.astype(jnp.int8)
    else:
        o_ref[0] = y.astype(o_ref.dtype)


def int8_matmul_fused(xq: jax.Array, wq: jax.Array, scale: jax.Array,
                      bias: jax.Array, *,
                      resid: Optional[jax.Array] = None,
                      gelu: bool = False,
                      out_quant_scale: Optional[jax.Array] = None,
                      out_dtype=jnp.bfloat16) -> jax.Array:
    """``y = act(xq @ wq · scale + bias) [+ resid]``, one Pallas kernel.

    xq: int8 [B, S, K] (pre-quantized activation); wq: int8 [K, N];
    scale: f32 [N] — the *combined* activation × per-channel weight scale
    (``x_scale * qw.scale``); bias: f32 [N]. ``gelu`` applies the exact-erf
    GELU (before the residual); ``resid`` fuses the skip-connection add;
    ``out_quant_scale`` (f32 scalar) re-quantizes the result to int8 for
    the next matmul. Returns [B, S, N] in ``out_dtype`` (or int8).
    """
    b, s, k = xq.shape
    n = wq.shape[1]
    quant = out_quant_scale is not None
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    in_specs = [
        pl.BlockSpec((1, s, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xq, wq, sb]
    if resid is not None:
        in_specs.append(pl.BlockSpec((1, s, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(resid)
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.reshape(out_quant_scale, (1,)).astype(jnp.float32))

    out_dtype = jnp.int8 if quant else out_dtype
    fn = pl.pallas_call(
        functools.partial(_kernel, gelu=gelu, quant=quant,
                          resid=resid is not None),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )
    return fn(*args)


def quantize_static(x: jax.Array, x_scale: jax.Array) -> jax.Array:
    """Elementwise static quantize — left to XLA so it fuses into the
    producing op (LayerNorm / patchify); the int8 result is what crosses
    HBM into :func:`int8_matmul_fused`."""
    q = jnp.round(x.astype(jnp.float32) / x_scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
