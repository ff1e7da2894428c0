"""Single-process behavior of the multi-host utilities (true multi-host
needs a cluster; these pin the degraded path the trainer relies on)."""

import numpy as np

import jax

from chestxray_vit_tpu.parallel import distributed as D
from chestxray_vit_tpu.parallel import mesh as mesh_lib


def test_single_host_defaults():
    D.initialize()                    # must not raise on a dev box
    assert D.is_primary()
    D.barrier("test")                 # no-op


def test_host_shard_range_covers_batch():
    r = D.host_shard_range(32)
    assert list(r) == list(range(32))


def test_form_global_batch_places_on_mesh(rng):
    mesh = mesh_lib.build_mesh()
    batch = {"pixel_values_u8": rng.integers(0, 255, (16, 8, 8)).astype(np.uint8),
             "labels": rng.random((16, 4)).astype(np.float32)}
    placed = D.form_global_batch(mesh, batch)
    assert placed["labels"].shape == (16, 4)
    assert "data" in str(placed["labels"].sharding.spec)


def test_process_allgather_identity(rng):
    x = rng.random((4, 3)).astype(np.float32)
    np.testing.assert_array_equal(D.process_allgather(x), x)
