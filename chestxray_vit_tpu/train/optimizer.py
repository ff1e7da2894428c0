"""Owned AdamW + schedules (no optax dependency in the hot path).

The reference uses HF Trainer's default optimizer stack: AdamW
(lr 1e-4 / wd 0.01 in the production variant, pyc L84-L85), a linear-decay
schedule with no warmup, global-norm gradient clipping at 1.0, and HF's
decay mask (no weight decay on biases or LayerNorm weights) — SURVEY.md §2.2.
All reimplemented here as pure pytree functions in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Any
OptState = Dict[str, Any]


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def linear_schedule(base_lr: float, total_steps: int,
                    warmup_steps: int = 0) -> Callable[[jax.Array], jax.Array]:
    """HF Trainer default: linear warmup (0 steps by default) then linear
    decay to 0 at ``total_steps``."""

    def lr(step: jax.Array) -> jax.Array:
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            warmup_steps > 0,
            jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0), 1.0)
        decay_span = jnp.maximum(total_steps - warmup_steps, 1)
        decay = jnp.clip(
            (total_steps - step) / decay_span, 0.0, 1.0)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return lr


def cosine_schedule(base_lr: float, total_steps: int,
                    warmup_steps: int = 0) -> Callable[[jax.Array], jax.Array]:
    def lr(step: jax.Array) -> jax.Array:
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps)
                            / jnp.maximum(total_steps - warmup_steps, 1),
                            0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return lr


def constant_schedule(base_lr: float, *_args) -> Callable:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


SCHEDULES = {
    "linear": linear_schedule,
    "cosine": cosine_schedule,
    "constant": constant_schedule,
}


# ---------------------------------------------------------------------------
# Decay mask (HF Trainer get_decay_parameter_names parity)
# ---------------------------------------------------------------------------

def default_decay_mask(params: Params) -> Params:
    """True where weight decay applies. HF Trainer decays everything except
    biases and LayerNorm weights; cls_token/pos_embed DO decay (they are
    plain Parameters, not LayerNorm/bias)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1] if path else ""
        in_ln = any(p in ("ln1", "ln2", "final_ln") for p in path)
        return not (name == "bias" or in_ln)

    return walk(params, ())


# ---------------------------------------------------------------------------
# AdamW
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AdamWConfig:
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0


def init_opt_state(params: Params) -> OptState:
    zeros = lambda p: jax.tree.map(
        lambda a: jnp.zeros(a.shape, jnp.float32), p)
    return {"mu": zeros(params), "nu": zeros(params)}


def global_norm(tree: Params) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(a.astype(jnp.float32)))
                        for a in leaves))


def clip_by_global_norm(grads: Params,
                        max_norm: float) -> Tuple[Params, jax.Array]:
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def adamw_update(grads: Params, opt_state: OptState, params: Params,
                 step: jax.Array, lr: jax.Array,
                 cfg: AdamWConfig, decay_mask: Params) -> Tuple[Params, OptState]:
    """One AdamW step (decoupled weight decay, bias-corrected moments).

    ``step`` is the 0-based completed-step counter; bias correction uses
    t = step + 1, matching torch.optim.AdamW.
    """
    t = (step + 1).astype(jnp.float32)
    c1 = 1.0 - cfg.b1 ** t
    c2 = 1.0 - cfg.b2 ** t

    def upd(g, mu, nu, p, decay):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        mu = cfg.b1 * mu + (1.0 - cfg.b1) * g
        nu = cfg.b2 * nu + (1.0 - cfg.b2) * jnp.square(g)
        mu_hat = mu / c1
        nu_hat = nu / c2
        step_val = mu_hat / (jnp.sqrt(nu_hat) + cfg.eps)
        wd = cfg.weight_decay if decay else 0.0
        new_p = p32 - lr * (step_val + wd * p32)
        return new_p.astype(p.dtype), mu, nu

    flat_g, treedef = jax.tree.flatten(grads)
    flat_mu = jax.tree.leaves(opt_state["mu"])
    flat_nu = jax.tree.leaves(opt_state["nu"])
    flat_p = jax.tree.leaves(params)
    flat_mask = jax.tree.leaves(decay_mask)

    new_p, new_mu, new_nu = [], [], []
    for g, mu, nu, p, m in zip(flat_g, flat_mu, flat_nu, flat_p, flat_mask):
        np_, nmu, nnu = upd(g, mu, nu, p, m)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)

    return (jax.tree.unflatten(treedef, new_p),
            {"mu": jax.tree.unflatten(treedef, new_mu),
             "nu": jax.tree.unflatten(treedef, new_nu)})
