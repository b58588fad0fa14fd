"""Native IO runtime tests: build, gather parity, deterministic RNG,
JPEG decode+crop+resize vs the PIL oracle, prefetcher."""

import numpy as np
import pytest

from facegen import native


def test_native_builds_and_loads():
    assert native.available(), "native library failed to build/load"


def test_gather_rows_matches_numpy():
    store = np.random.RandomState(0).randint(0, 256, (100, 8, 8, 3)).astype(np.uint8)
    idx = np.array([5, 0, 99, 42, 42, 7], np.int64)
    got = native.gather_rows(store, idx)
    np.testing.assert_array_equal(got, store[idx])


def test_gather_rows_float_store():
    store = np.random.RandomState(1).rand(50, 17).astype(np.float32)
    idx = np.array([3, 3, 49, 0], np.int64)
    got = native.gather_rows(store, idx)
    np.testing.assert_array_equal(got, store[idx])


def test_random_indices_deterministic_and_in_range():
    a = native.random_indices(10, 500, 1000, seed=7)
    b = native.random_indices(10, 500, 1000, seed=7)
    c = native.random_indices(10, 500, 1000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= 10 and a.max() < 500
    # roughly uniform
    assert len(np.unique(a)) > 300


def test_decode_crop_resize_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rng.randint(0, 256, (250, 250, 3)).astype(np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))
    got = native.decode_crop_resize_batch(paths, out_size=64)
    assert got.shape == (4, 64, 64, 3)
    # PIL oracle
    from facegen.data.lfw import load_and_crop

    for i, p in enumerate(paths):
        ref = load_and_crop(p).astype(np.int16)
        diff = np.abs(got[i].astype(np.int16) - ref)
        # decode is exact (same libjpeg), resize rounding may differ by
        # a few counts per pixel between the two bilinear impls
        assert float(np.mean(diff)) < 4.0, float(np.mean(diff))


def test_decode_fallback_honors_crop_and_out_size(tmp_path, monkeypatch):
    """The PIL fallback must honor the crop box and out_size it was
    asked for (review fix: it used to apply the fixed LFW crop to
    --no-crop builds and crash for out_size != 64)."""
    from PIL import Image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (250, 250, 3)).astype(np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(img).save(p, quality=95)

    monkeypatch.setattr(native, "get_lib", lambda: None)  # force fallback
    # --no-crop sentinel box: full frame, any out_size
    got = native.decode_crop_resize_batch(
        [str(p)], out_size=32, crop=(0, 1 << 30, 0, 1 << 30))
    assert got.shape == (1, 32, 32, 3)
    decoded = np.asarray(Image.open(p).convert("RGB"))
    ref = np.asarray(
        Image.fromarray(decoded).resize((32, 32), Image.BILINEAR))
    np.testing.assert_array_equal(got[0], ref)
    # default crop box at a non-default out_size
    got64 = native.decode_crop_resize_batch([str(p)], out_size=48)
    assert got64.shape == (1, 48, 48, 3)
    ref48 = np.asarray(
        Image.fromarray(decoded[92:176, 83:167]).resize((48, 48),
                                                        Image.BILINEAR))
    np.testing.assert_array_equal(got64[0], ref48)


def test_prefetcher_synthetic_noop_and_sync_equal():
    import jax

    from facegen.data.pipeline import DataSource, Prefetcher

    src = DataSource(scale=16, channels=1, synthetic=True)
    pf = Prefetcher(src, 8)
    pool1 = pf.get(jax.random.key(0))  # synchronous path
    assert pool1.shape == (8, 16, 16, 1)
    pf.schedule(jax.random.key(0))  # no-op for synthetic sources
    pool2 = pf.get(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(pool1), np.asarray(pool2))


def test_prefetcher_store_path_matches_direct():
    import jax

    from facegen.data.pipeline import DataSource, Prefetcher

    store = np.random.RandomState(0).randint(0, 256, (64, 64, 64, 3)).astype(np.uint8)
    # hbm_store=False pins the threaded host-gather path this test covers
    src = DataSource(scale=16, channels=3, store=store, augment=False,
                     hbm_store=False)
    pf = Prefetcher(src, 8)
    direct = src.epoch_pool(jax.random.key(1), 8)
    pf.schedule(jax.random.key(1))
    fetched = pf.get(jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(fetched))
