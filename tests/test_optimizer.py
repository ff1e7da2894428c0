"""AdamW/schedule tests against the torch oracle (the reference's optimizer
is HF Trainer's default torch AdamW, SURVEY §2.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.train import optimizer as opt


def test_adamw_matches_torch(rng):
    torch = pytest.importorskip("torch")
    shapes = {"w": (4, 3), "b": (3,)}
    params = {k: jnp.asarray(rng.standard_normal(s), jnp.float32)
              for k, s in shapes.items()}
    tparams = {k: torch.nn.Parameter(torch.from_numpy(np.asarray(v)).clone())
               for k, v in params.items()}
    lr, wd = 1e-3, 0.01
    topt = torch.optim.AdamW(list(tparams.values()), lr=lr, weight_decay=wd,
                             betas=(0.9, 0.999), eps=1e-8)
    cfg = opt.AdamWConfig(weight_decay=wd)
    state = opt.init_opt_state(params)
    mask = {"w": True, "b": True}  # torch applies wd to every param group here

    for step in range(5):
        grads = {k: jnp.asarray(rng.standard_normal(shapes[k]), jnp.float32)
                 for k in shapes}
        for k in tparams:
            tparams[k].grad = torch.from_numpy(np.asarray(grads[k])).clone()
        topt.step()
        params, state = opt.adamw_update(
            grads, state, params, jnp.asarray(step), jnp.asarray(lr),
            cfg, mask)
        for k in shapes:
            np.testing.assert_allclose(np.asarray(params[k]),
                                       tparams[k].detach().numpy(),
                                       atol=1e-6, rtol=1e-6)


def test_decay_mask_excludes_bias_and_layernorm():
    tree = {
        "blocks": {
            "ln1": {"scale": 0, "bias": 0},
            "wq": {"kernel": 0, "bias": 0},
        },
        "final_ln": {"scale": 0, "bias": 0},
        "cls_token": 0,
        "pos_embed": 0,
        "head": {"kernel": 0, "bias": 0},
    }
    mask = opt.default_decay_mask(tree)
    assert mask["blocks"]["wq"]["kernel"] is True
    assert mask["blocks"]["wq"]["bias"] is False
    assert mask["blocks"]["ln1"]["scale"] is False
    assert mask["final_ln"]["bias"] is False
    assert mask["cls_token"] is True          # HF Trainer decays these
    assert mask["pos_embed"] is True
    assert mask["head"]["kernel"] is True


def test_linear_schedule_hf_semantics():
    sched = opt.linear_schedule(1e-4, total_steps=100, warmup_steps=0)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(50)) == pytest.approx(5e-5)
    assert float(sched(100)) == 0.0
    warm = opt.linear_schedule(1e-4, total_steps=100, warmup_steps=10)
    assert float(warm(0)) == 0.0
    assert float(warm(5)) == pytest.approx(5e-5)
    assert float(warm(10)) == pytest.approx(1e-4)
    assert float(warm(55)) == pytest.approx(5e-5)


def test_clip_by_global_norm():
    grads = {"a": jnp.ones((3,)) * 3.0, "b": jnp.ones((4,)) * 4.0}
    clipped, norm = opt.clip_by_global_norm(grads, 1.0)
    assert float(norm) == pytest.approx(np.sqrt(27 + 64), rel=1e-6)
    total = opt.global_norm(clipped)
    assert float(total) == pytest.approx(1.0, rel=1e-4)
    # under the max norm → untouched
    small, norm2 = opt.clip_by_global_norm({"a": jnp.ones((2,)) * 0.1}, 1.0)
    np.testing.assert_allclose(np.asarray(small["a"]), 0.1, rtol=1e-5)


def test_cosine_and_constant_schedules():
    cos = opt.cosine_schedule(1e-3, total_steps=100, warmup_steps=10)
    assert float(cos(0)) == 0.0
    assert float(cos(10)) == pytest.approx(1e-3)
    assert float(cos(55)) == pytest.approx(5e-4, rel=1e-3)  # cos midpoint
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-9)
    const = opt.constant_schedule(2e-4)
    assert float(const(0)) == float(const(999)) == pytest.approx(2e-4)
