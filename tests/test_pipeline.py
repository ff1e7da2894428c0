"""Input-pipeline integration tests over the synthetic NIH bucket
(SURVEY §4: fake in-memory store standing in for the bucket layout)."""

import numpy as np
import pytest

from chestxray_vit_tpu.config import DataConfig
from chestxray_vit_tpu.data import decode as dec
from chestxray_vit_tpu.data import pipeline as pipe
from chestxray_vit_tpu.data.storage import LocalStore, MemoryStore, build_blob_map
from chestxray_vit_tpu.data.testing import build_fake_nih


@pytest.fixture(scope="module")
def fake():
    return build_fake_nih(num_images=48, image_size=64, seed=3)


def _cfg(**kw):
    return DataConfig(backend="memory", **kw)


def test_build_blob_map_layout(fake):
    m = build_blob_map(fake.store, _cfg())
    assert len(m) == 48
    name = fake.image_names[0]
    assert m[name].startswith("images_001/images/")


def test_build_datasets_official_lists(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    n_test = len(fake.image_names) // 5
    n_train_val = 48 - n_test
    assert len(b.test) == n_test
    assert len(b.train) + len(b.val) == n_train_val
    # 0.15 val fraction, ceil
    assert len(b.val) == int(np.ceil(0.15 * n_train_val))
    assert "No Finding" in b.classes
    # no leakage
    assert not (set(b.train.filenames) & set(b.val.filenames))
    assert not (set(b.train.filenames) & set(b.test.filenames))


def test_build_datasets_subset(fake):
    b = pipe.build_datasets(_cfg(use_subset_data=10), store=fake.store)
    assert len(b.train) == 10
    assert len(b.val) == 2  # N // 5 (pyc L431)


def test_build_datasets_80_10_10(fake):
    b = pipe.build_datasets(_cfg(split_scheme="random_80_10_10"),
                            store=fake.store)
    assert len(b.train) + len(b.val) + len(b.test) == 48


def test_sample_loader_host_path(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    s = loader.load(0)
    assert s["pixel_values_u8"].shape == (64, 64)
    assert s["pixel_values_u8"].dtype == np.uint8
    assert s["labels"].shape == (len(b.classes),)
    assert s["labels"].dtype == np.float32


def test_sample_loader_device_path(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               placement="device", canvas_size=128,
                               prefer_native_decode=False)
    s = loader.load(0)
    assert s["canvas_u8"].shape == (128, 128)
    assert s["boxes"].shape == (4,)
    # crop window within canvas
    l, t, w, h = s["boxes"]
    assert 0 <= l and l + w <= 128 and 0 <= t and t + h <= 128


def test_missing_blob_yields_dummy(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    blob_map = dict(b.blob_map)
    victim = b.train.filenames[0]
    del blob_map[victim]  # simulate a missing blob (pyc L283/L286 fallback)
    loader = pipe.SampleLoader(b.train, blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    s = loader.load(0)
    assert (s["pixel_values_u8"] == 0).all()


def test_iterate_batches_shapes_and_order(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    batches = list(pipe.iterate_batches(loader, 8, epoch=0, shuffle=True,
                                        num_workers=4, drop_last=True))
    assert all(bt["pixel_values_u8"].shape == (8, 64, 64) for bt in batches)
    assert len(batches) == len(b.train) // 8
    # deterministic given (seed, epoch)
    again = list(pipe.iterate_batches(loader, 8, epoch=0, shuffle=True,
                                      num_workers=2, drop_last=True))
    for x, y in zip(batches, again):
        np.testing.assert_array_equal(x["pixel_values_u8"],
                                      y["pixel_values_u8"])
    # different epoch → different order
    other = list(pipe.iterate_batches(loader, 8, epoch=1, shuffle=True,
                                      num_workers=2, drop_last=True))
    assert any((x["labels"] != y["labels"]).any()
               for x, y in zip(batches, other))


def test_iterate_batches_pad_last(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.val, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    n = len(b.val)
    batches = list(pipe.iterate_batches(loader, 4, pad_last=True))
    assert sum(int(bt["num_valid"]) for bt in batches) == n
    assert all(bt["labels"].shape[0] == 4 for bt in batches)


def test_augmented_batches_deterministic(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               augment=True, prefer_native_decode=False)
    a = list(pipe.iterate_batches(loader, 8, epoch=0, shuffle=True,
                                  drop_last=True))
    bb = list(pipe.iterate_batches(loader, 8, epoch=0, shuffle=True,
                                   drop_last=True))
    for x, y in zip(a, bb):
        np.testing.assert_array_equal(x["pixel_values_u8"],
                                      y["pixel_values_u8"])


def test_device_prefetcher_passthrough(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    it = pipe.iterate_batches(loader, 8, drop_last=True)
    seen = list(pipe.DevicePrefetcher(it, place_fn=lambda x: x, depth=2))
    assert len(seen) == len(b.train) // 8


def test_local_store_roundtrip(tmp_path, fake):
    # materialize the fake bucket on disk, reread through LocalStore
    import os
    for name in fake.store.list(""):
        p = tmp_path / name
        os.makedirs(p.parent, exist_ok=True)
        p.write_bytes(fake.store.get(name))
    store = LocalStore(str(tmp_path))
    cfg = DataConfig(backend="local", local_root=str(tmp_path))
    b = pipe.build_datasets(cfg, store=store)
    assert len(b.train) > 0
    loader = pipe.SampleLoader(b.train, b.blob_map, store, img_size=64,
                               prefer_native_decode=False)
    s = loader.load(0)
    assert s["pixel_values_u8"].shape == (64, 64)


def test_decode_dummy_on_garbage():
    out = dec.safe_decode_gray(b"not an image", dummy_size=(32, 32),
                               prefer_native=False)
    assert out.shape == (32, 32) and (out == 0).all()


class FlakyStore:
    """Fault-injection wrapper: every k-th get raises (SURVEY §5: the
    reference's only resilience is per-sample degrade-to-dummy; ours must
    survive intermittent storage failures the same way)."""

    def __init__(self, inner, every=3):
        self.inner, self.every, self.calls = inner, every, 0

    def get(self, name):
        self.calls += 1
        if self.calls % self.every == 0:
            raise IOError(f"injected failure #{self.calls}")
        return self.inner.get(name)

    def list(self, prefix):
        return self.inner.list(prefix)

    def exists(self, name):
        return self.inner.exists(name)


def test_fault_injection_degrades_to_dummies(fake):
    b = pipe.build_datasets(_cfg(), store=fake.store)
    flaky = FlakyStore(fake.store, every=3)
    loader = pipe.SampleLoader(b.train, b.blob_map, flaky, img_size=64,
                               prefer_native_decode=False)
    batches = list(pipe.iterate_batches(loader, 8, num_workers=4,
                                        drop_last=True))
    # every batch materializes despite ~1/3 of fetches failing
    assert len(batches) == len(b.train) // 8
    n_black = sum(int((bt["pixel_values_u8"] == 0).all(axis=(1, 2)).sum())
                  for bt in batches)
    assert n_black >= len(b.train) // 5   # failures became dummy images
    # labels stay aligned for non-dummy samples
    healthy = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                                prefer_native_decode=False)
    s_flaky = loader.load(1)
    s_ok = healthy.load(1)
    np.testing.assert_array_equal(s_flaky["labels"], s_ok["labels"])


def test_host_range_ragged_tail_raises(fake):
    """Multi-host slicing over a ragged global tail would give hosts
    unequal shard shapes — iterate_batches must refuse unless the caller
    picked drop_last or pad_last (which restore uniformity)."""
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    bs = len(b.train) - 1                   # guarantees a 1-sample tail
    with pytest.raises(ValueError, match="host_range"):
        list(pipe.iterate_batches(loader, bs, num_workers=2,
                                  host_range=(0, bs // 2)))
    got = list(pipe.iterate_batches(loader, bs, num_workers=2,
                                    drop_last=True,
                                    host_range=(0, bs // 2)))
    assert len(got) == 1
    assert got[0]["labels"].shape[0] == bs // 2
    padded = list(pipe.iterate_batches(loader, bs, num_workers=2,
                                       pad_last=True,
                                       host_range=(0, bs // 2)))
    assert len(padded) == 2
    assert int(padded[-1]["num_valid"]) == 1   # global valid count


def test_device_prefetcher_close_releases_producer(fake):
    """Abandoning iteration early (max_steps mid-epoch) must stop the
    producer thread — it used to block in q.put forever, pinning queued
    batches and the decode pool."""
    import threading as _threading
    b = pipe.build_datasets(_cfg(), store=fake.store)
    loader = pipe.SampleLoader(b.train, b.blob_map, fake.store, img_size=64,
                               prefer_native_decode=False)
    before = _threading.active_count()
    pf = pipe.DevicePrefetcher(
        pipe.iterate_batches(loader, 4, num_workers=2, prefetch_batches=2),
        place_fn=lambda x: x, depth=2)
    next(iter(pf))                       # consume one batch, abandon rest
    pf.close()
    import time as _time
    deadline = _time.time() + 5
    while _threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert _threading.active_count() <= before, "producer threads leaked"
