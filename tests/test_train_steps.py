"""Train/eval step tests on the virtual 8-device CPU mesh: loss decreases,
BCE matches torch, DP sharding compiles and matches single-device numerics
(the reference's only parallelism is 8-core DP, SURVEY §2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chestxray_vit_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.parallel import mesh as mesh_lib
from chestxray_vit_tpu.train import steps as S


def tiny_config(**train_kw) -> Config:
    return Config(
        model=ModelConfig(img_size=32, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          num_classes=5, dtype="float32",
                          attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=2, learning_rate=1e-3,
                          **train_kw),
    )


def make_batch(rng, n, cfg):
    return {
        "pixel_values": jnp.asarray(
            rng.standard_normal((n, cfg.model.img_size, cfg.model.img_size, 3)),
            jnp.float32),
        "labels": jnp.asarray(
            (rng.random((n, cfg.model.num_classes)) < 0.3), jnp.float32),
    }


def test_bce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((8, 15)).astype(np.float32)
    labels = (rng.random((8, 15)) < 0.3).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits),
                                       torch.from_numpy(labels)).item()
    ours = float(S.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_loss_decreases_single_device(rng):
    cfg = tiny_config()
    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=0)
    step = jax.jit(S.make_train_step(cfg, total_steps=100))
    batch = make_batch(rng, 8, cfg)
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 20
    assert np.isfinite(losses).all()


def test_dp_mesh_8_devices_compiles_and_matches(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    mesh = mesh_lib.build_mesh(MeshConfig())
    assert mesh.shape["data"] == 8

    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=0)
    batch = make_batch(rng, 16, cfg)  # 2 per device

    # single-device oracle
    state_1 = jax.tree.map(lambda x: x, state)
    step_1 = jax.jit(S.make_train_step(cfg, total_steps=100))
    ref_state, ref_m = step_1(state_1, batch)

    # 8-way DP
    step_8 = S.jit_train_step(S.make_train_step(cfg, total_steps=100),
                              mesh, state)
    st = S.place_state(state, mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    new_state, m = step_8(st, sharded)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    # parameters after one step agree between DP=1 and DP=8
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_sharded(rng):
    cfg = tiny_config()
    mesh = mesh_lib.build_mesh(MeshConfig())
    params = vit.init_params(jax.random.key(1), cfg.model)
    batch = make_batch(rng, 16, cfg)
    ev = S.jit_eval_step(S.make_eval_step(cfg), mesh, params)
    logits, row_loss = ev(params, mesh_lib.shard_batch(mesh, batch))
    assert logits.shape == (16, 5)
    assert row_loss.shape == (16,)
    ref = vit.apply(params, batch["pixel_values"], cfg.model)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)
    # the fused per-row BCE element sums reproduce bce_with_logits exactly:
    # mean over all elements == sum(row sums) / (B * C)
    ref_loss = float(S.bce_with_logits(ref, batch["labels"]))
    np.testing.assert_allclose(float(np.sum(row_loss)) / (16 * 5),
                               ref_loss, atol=1e-6)


def test_fsdp_mesh_sharding(rng):
    """fsdp axis shards the big scanned kernels (ZeRO-3 via shardings);
    the step matches single-device numerics, not just runs."""
    cfg = tiny_config()
    mesh = mesh_lib.build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    params = vit.init_params(jax.random.key(0), cfg.model)
    sh = mesh_lib.param_sharding(mesh, params)
    mlp_sh = sh["blocks"]["mlp_in"]["kernel"]
    assert "fsdp" in str(mlp_sh.spec)
    state = S.TrainState.create(params, seed=0)
    batch = make_batch(rng, 16, cfg)
    ref_state, ref_m = jax.jit(S.make_train_step(cfg, 10))(
        jax.tree.map(lambda x: x, state), batch)

    step = S.jit_train_step(S.make_train_step(cfg, total_steps=10),
                            mesh, state)
    st = S.place_state(state, mesh)
    new_state, m = step(st, mesh_lib.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tensor_parallel_mesh(rng):
    """Megatron-style tensor sharding on the 'tensor' axis: step compiles,
    runs, and matches single-device numerics."""
    cfg = tiny_config()
    mesh = mesh_lib.build_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    params = vit.init_params(jax.random.key(0), cfg.model)
    sh = mesh_lib.param_sharding(mesh, params)
    assert "tensor" in str(sh["blocks"]["mlp_in"]["kernel"].spec)
    assert "tensor" in str(sh["blocks"]["wo"]["kernel"].spec)
    assert "tensor" not in str(sh["blocks"]["ln1"]["scale"].spec)

    state = S.TrainState.create(params, seed=0)
    batch = make_batch(rng, 8, cfg)
    ref_state, ref_m = jax.jit(S.make_train_step(cfg, 100))(
        jax.tree.map(lambda x: x, state), batch)

    step = S.jit_train_step(S.make_train_step(cfg, 100), mesh, state)
    st = S.place_state(state, mesh)
    new_state, m = step(st, mesh_lib.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_gradient_accumulation_matches_full_batch(rng):
    """k micro-batches averaged inside the jitted step == one big batch
    (equal micro sizes, mean-reduced BCE): same loss, same params after the
    update."""
    import dataclasses
    cfg = tiny_config()
    batch = make_batch(rng, 16, cfg)
    params = vit.init_params(jax.random.key(0), cfg.model)

    ref_state, ref_m = jax.jit(S.make_train_step(cfg, 100))(
        S.TrainState.create(params, seed=0), batch)

    cfg_acc = dataclasses.replace(cfg)
    cfg_acc.train = dataclasses.replace(
        cfg.train, gradient_accumulation_steps=4)
    acc_state, acc_m = jax.jit(S.make_train_step(cfg_acc, 100))(
        S.TrainState.create(params, seed=0), batch)

    np.testing.assert_allclose(float(acc_m["loss"]), float(ref_m["loss"]),
                               atol=1e-6)
    np.testing.assert_allclose(float(acc_m["grad_norm"]),
                               float(ref_m["grad_norm"]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(acc_state.params),
                    jax.tree.leaves(ref_state.params)):
        # the shard-aligned strided micro split reorders the fp summation
        # vs the one-shot batch; agreement is to summation tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_gradient_accumulation_trains_end_to_end(tmp_path, rng):
    """Trainer consumes k x bigger loader batches and takes one update."""
    from chestxray_vit_tpu.config import Config, DataConfig, TrainConfig
    from chestxray_vit_tpu.data.testing import build_fake_nih
    from chestxray_vit_tpu.train.trainer import Trainer

    fake = build_fake_nih(num_images=80, image_size=64, seed=11)
    cfg = Config(
        data=DataConfig(backend="memory"),
        model=ModelConfig(img_size=64, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=4, mlp_dim=128,
                          dtype="float32", attention_impl="xla"),
        train=TrainConfig(batch_size_per_core=1,
                          gradient_accumulation_steps=3,
                          max_steps=2, eval_strategy="no",
                          save_strategy="steps", save_steps=100,
                          logging_steps=100, load_best_model_at_end=False,
                          output_dir=str(tmp_path / "o"), report_to="none"))
    tr = Trainer(cfg, store=fake.store, pretrained=False)
    assert tr.global_batch == 1 * 8 * 3      # per-core x 8 devices x accum
    metrics = tr.train()
    assert metrics["train_steps"] == 2
    tr.close()


def test_dcn_multislice_mesh_matches_single_device(rng):
    """dcn_data > 1 adds a leading 'dcn' mesh axis (multi-slice over DCN):
    2 slices x (2 data x 2 fsdp) on the virtual 8-device mesh. The batch
    splits over (dcn, data, fsdp) and one full train step matches the
    single-device oracle — cross-slice grad all-reduce included."""
    cfg = tiny_config()
    mesh = mesh_lib.build_mesh(MeshConfig(data=2, fsdp=2, tensor=1,
                                          dcn_data=2))
    assert mesh.axis_names == ("dcn", "data", "fsdp", "tensor")
    assert mesh.shape["dcn"] == 2
    assert mesh_lib.dp_size(mesh) == 8
    assert mesh_lib.local_batch_to_global(2, mesh) == 16

    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=0)
    batch = make_batch(rng, 16, cfg)

    ref_state, ref_m = jax.jit(S.make_train_step(cfg, total_steps=100))(
        jax.tree.map(lambda x: x, state), batch)

    step = S.jit_train_step(S.make_train_step(cfg, total_steps=100),
                            mesh, state)
    new_state, m = step(S.place_state(state, mesh),
                        mesh_lib.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dcn_mesh_device_count_mismatch():
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.build_mesh(MeshConfig(data=8, fsdp=1, tensor=1,
                                       dcn_data=2))


def test_tome_train_step_on_sharded_meshes(rng):
    """The accelerated train recipe (model.tome_r, decreasing schedule)
    composes with fsdp- and tensor-sharded meshes: the jitted step
    compiles over the 8-device mesh and matches single-device numerics.
    Merging is per-sample (routing matmul inside the batch-sharded
    forward), so no collective crosses the merge — this pins that XLA
    partitions it that way instead of silently gathering."""
    cfg = tiny_config()
    cfg.model.tome_r = 2                 # 5 tokens: layer-2 count clamps
    cfg.model.tome_schedule = "decreasing"
    params = vit.init_params(jax.random.key(0), cfg.model)
    state = S.TrainState.create(params, seed=0)
    batch = make_batch(rng, 16, cfg)
    ref_state, ref_m = jax.jit(S.make_train_step(cfg, 10))(
        jax.tree.map(lambda x: x, state), batch)

    for mesh_cfg in (MeshConfig(data=2, fsdp=4, tensor=1),
                     MeshConfig(data=2, fsdp=1, tensor=4)):
        mesh = mesh_lib.build_mesh(mesh_cfg)
        # fresh state per mesh: the jitted step donates its input state,
        # and place_state may alias the host tree's buffers
        state_i = S.TrainState.create(
            vit.init_params(jax.random.key(0), cfg.model), seed=0)
        step = S.jit_train_step(S.make_train_step(cfg, total_steps=10),
                                mesh, state_i)
        st = S.place_state(state_i, mesh)
        new_state, m = step(st, mesh_lib.shard_batch(mesh, batch))
        np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                                   atol=1e-5)
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(ref_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
