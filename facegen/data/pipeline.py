"""Epoch data pipeline: host store -> HBM-resident uint8 pool.

Replaces dataset.lua's per-epoch JPEG reload (train.lua:201 ->
dataset.lua:80-117 decodes and bilinearly rescales every image from disk
EVERY epoch) with:

  1. host: sample N_epoch random rows from the memory-mapped store
     (uint8, 64x64x3) — a cheap gather;
  2. one device_put of the uint8 block (the only host->device transfer
     per epoch);
  3. on device, jit-compiled: optional augmentation (data/augment.py),
     grayscale conversion, bilinear resize to the training scale, back
     to uint8 for HBM-resident storage.

The train step then gathers random batches from this pool entirely
on-chip (train/step.py), so steady-state training does zero host
round-trips — the reference crosses host<->GPU per forward
(nn_utils.lua:357-359).

Grayscale uses the BT.601 luma weights torch's image.rgb2y applies for
1-channel loads (dataset.lua:90 image.load(..., nbChannels)).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facegen.data.augment import AugmentConfig, augment_batch

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


@partial(jax.jit, static_argnames=("scale", "channels", "augment"))
def prepare_pool(
    raw: jax.Array,
    key: jax.Array,
    scale: int,
    channels: int,
    augment: bool = True,
) -> jax.Array:
    """(N, 64, 64, 3) uint8 -> (N, scale, scale, channels) uint8."""
    x = raw.astype(jnp.float32) / 255.0
    if augment:
        x = augment_batch(key, x, AugmentConfig())
    if channels == 1:
        x = (x @ _LUMA)[..., None]
    n = x.shape[0]
    if scale != x.shape[1]:
        x = jax.image.resize(x, (n, scale, scale, channels), method="linear")
    return jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)


def _one_pool(store, key, n, scale, channels, augment, holdout):
    """The single fused pool build: index draw + gather + augment +
    resize. Bitwise-identical to the host route (DataSource.draw_indices
    sorts its randint draw; jnp.sort here reproduces it exactly). The
    ONE copy of the draw logic behind both jitted wrappers below — the
    row-for-row single-vs-stacked equivalence contract lives here."""
    k_sel, k_aug = jax.random.split(key)
    idx = jnp.sort(jax.random.randint(k_sel, (n,), holdout, store.shape[0]))
    raw = jnp.take(store, idx, axis=0)
    return prepare_pool(raw, k_aug, scale, channels, augment)


@partial(jax.jit, static_argnames=("n", "scale", "channels", "augment", "holdout"))
def _pool_from_device_store(
    store: jax.Array,
    key: jax.Array,
    n: int,
    scale: int,
    channels: int,
    augment: bool,
    holdout: int,
) -> jax.Array:
    """One fused device program with ZERO host work and one dispatch
    instead of four round-trips — the fast path when the packed store
    fits in HBM (see DataSource.device_store)."""
    return _one_pool(store, key, n, scale, channels, augment, holdout)


@partial(jax.jit, static_argnames=("n", "scale", "channels", "augment", "holdout"))
def _pools_from_device_store(
    store: jax.Array,
    keys: jax.Array,
    n: int,
    scale: int,
    channels: int,
    augment: bool,
    holdout: int,
) -> jax.Array:
    """(E,) keys -> (E, n, scale, scale, channels) pools in ONE program.

    `lax.map` (not vmap) keeps peak memory at one epoch's float32
    intermediates while still paying a single host dispatch for a whole
    --epochsPerCompile chunk's worth of pools."""
    from jax import lax

    return lax.map(
        lambda k: _one_pool(store, k, n, scale, channels, augment, holdout),
        keys,
    )


# Packed stores at or below this size live in HBM for the run (the full
# 13k-image LFW store is ~160 MB against 16 GB of v5e HBM); bigger
# stores fall back to the threaded host-gather + prefetch path.
_HBM_STORE_MAX = int(
    __import__("os").environ.get("FACEGEN_HBM_STORE_MAX_BYTES", 2 << 30)
)


@dataclasses.dataclass
class DataSource:
    """Uniform front for packed-LFW or synthetic data.

    `epoch_pool(key, n)` returns an (n, scale, scale, channels) uint8
    device array — the equivalent of TRAIN_DATA = loadRandomImages(N)
    (train.lua:201).

    When the packed store fits in HBM (`_HBM_STORE_MAX`), it is uploaded
    ONCE and every pool is built by a single fused device program
    (`_pool_from_device_store`) — no per-epoch host gather, no
    host->device transfer, no prefetch thread. The reference re-decodes
    JPEGs from disk every epoch (dataset.lua:80-117).
    """

    scale: int
    channels: int
    store: Optional[np.ndarray] = None  # memmap (N, 64, 64, 3) uint8
    synthetic: bool = False
    augment: bool = True
    holdout: int = 0  # first `holdout` rows reserved (validation, c2f)
    threads: int = 8  # host gather threads (--threads, train.lua:66)
    hbm_store: bool = True  # allow the HBM-resident fast path
    _device_store: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False)

    @property
    def device_store(self) -> Optional[jax.Array]:
        """The HBM-resident store, or None when ineligible."""
        if (not self.hbm_store or self.synthetic or self.store is None
                or self.store.nbytes > _HBM_STORE_MAX):
            return None
        if self._device_store is None:
            self._device_store = jax.device_put(np.ascontiguousarray(self.store))
        return self._device_store

    @property
    def size(self) -> int:
        if self.store is not None:
            return int(self.store.shape[0]) - self.holdout
        # synthetic data is procedurally unbounded; report a finite
        # epoch-scale size so "n_epoch <= 0 = use the whole dataset"
        # stays a sane pool allocation (a 1<<30 sentinel here produced
        # petabyte pool requests downstream)
        return 16_384

    def draw_indices(self, key: jax.Array, n: int) -> np.ndarray:
        """Random store row indices for one pool, sorted for
        sequential-ish reads. Involves a device dispatch — call from the
        MAIN thread only (see Prefetcher)."""
        return np.sort(
            np.asarray(
                jax.random.randint(key, (n,), self.holdout, self.store.shape[0])
            )
        )

    def gather_indices(self, idx: np.ndarray) -> np.ndarray:
        """Pure host work (native threaded memcpy) — safe on any thread."""
        from facegen import native

        return native.gather_rows(np.asarray(self.store), idx,
                                  n_threads=self.threads)

    def host_gather(self, key: jax.Array, n: int) -> np.ndarray:
        """Host-side random gather from the memmap store."""
        return self.gather_indices(self.draw_indices(key, n))

    def raw_batch(self, key: jax.Array, n: int) -> jax.Array:
        """(n, 64, 64, 3) uint8 on device, pre-augmentation."""
        if self.synthetic or self.store is None:
            from facegen.data.synthetic import synthetic_faces

            return synthetic_faces(key, n)
        return jax.device_put(self.host_gather(key, n))

    def epoch_pool(self, key: jax.Array, n: int) -> jax.Array:
        dev = self.device_store
        if dev is not None:
            return _pool_from_device_store(
                dev, key, n, self.scale, self.channels, self.augment,
                self.holdout)
        k_sel, k_aug = jax.random.split(key)
        raw = self.raw_batch(k_sel, n)
        return prepare_pool(raw, k_aug, self.scale, self.channels, self.augment)

    def epoch_pool_stack(self, keys: jax.Array, n: int) -> jax.Array:
        """(E,) keys -> (E, n, scale, scale, channels) uint8 — one
        device program per chunk on the HBM-store path, a loop of
        `epoch_pool` otherwise. Row-for-row identical to E separate
        `epoch_pool` calls."""
        dev = self.device_store
        if dev is not None:
            return _pools_from_device_store(
                dev, keys, n, self.scale, self.channels, self.augment,
                self.holdout)
        return jnp.stack([self.epoch_pool(k, n) for k in keys])

    def range_pool(self, start: int, count: int, key: jax.Array) -> jax.Array:
        """Deterministic contiguous slice (dataset.lua:46-74
        loadImages(startAt, count)) — used for validation sets."""
        if self.synthetic or self.store is None:
            from facegen.data.synthetic import synthetic_faces

            raw = synthetic_faces(jax.random.key(start), count)
        else:
            raw = jax.device_put(
                np.ascontiguousarray(self.store[start : start + count])
            )
        return prepare_pool(raw, key, self.scale, self.channels, augment=False)


class Prefetcher:
    """Overlap the HOST side of the next epoch's pool build (memmap
    gather into a contiguous block, via the native threaded gather) with
    the current epoch's device training. The reference reloads and
    re-decodes JPEGs synchronously between epochs (train.lua:199-207).

    Only host work runs on the background thread; every device dispatch
    (device_put, augmentation, resize) happens on the caller's thread —
    remote-tunnel TPU clients are not safe for concurrent dispatch from
    multiple threads (concurrent compile + execute deadlocks).
    Synthetic sources have no host work, so prefetch is a no-op there.
    """

    def __init__(self, source: DataSource, n: int):
        import threading

        self.source = source
        self.n = n
        self._threading = threading
        self._thread = None
        self._result = None
        self._error = None

    def _worker(self, idx):
        try:
            self._result = self.source.gather_indices(idx)
        except BaseException as e:  # surfaced by get()
            self._error = e

    def schedule(self, key) -> None:
        if (self.source.synthetic or self.source.store is None
                or self.source.device_store is not None):
            return  # nothing host-side to overlap (HBM-resident store
            # builds pools entirely on device — get() takes that path)
        if self._thread is not None:
            # A previous epoch failed between schedule() and get() (or
            # get() was never called): drain the stale gather rather than
            # leaking the thread / asserting on the next epoch.
            self._thread.join()
            self._thread = None
            self._result = None
            self._error = None
        # index draw = a device dispatch: do it HERE on the caller
        # thread; the worker gets pure host work (remote-tunnel TPU
        # clients deadlock on concurrent dispatch from two threads)
        k_sel, _ = jax.random.split(key)
        idx = self.source.draw_indices(k_sel, self.n)
        self._thread = self._threading.Thread(
            target=self._worker, args=(idx,), daemon=True
        )
        self._thread.start()

    def get(self, key):
        """Finish the pending host gather (if any) and build the pool on
        the calling thread; falls back to a fully synchronous build."""
        if self._thread is None:
            return self.source.epoch_pool(key, self.n)
        self._thread.join()
        raw, err = self._result, self._error
        self._thread, self._result, self._error = None, None, None
        if err is not None:
            # surface the root cause, then retry synchronously — a
            # transient gather failure must not silently become a
            # "'NoneType' has no attribute" crash later
            print(f"<prefetcher> background gather failed ({err!r}); "
                  "rebuilding synchronously", flush=True)
            return self.source.epoch_pool(key, self.n)
        _, k_aug = jax.random.split(key)
        return prepare_pool(
            jax.device_put(raw), k_aug, self.source.scale, self.source.channels,
            self.source.augment,
        )


def make_source(cfg, holdout: int = 0) -> DataSource:
    """Build the DataSource a TrainConfig describes (store path selection
    mirrors train.lua:166-173)."""
    from facegen.data import lfw

    threads = int(getattr(cfg, "threads", 8))
    if cfg.synthetic_data:
        return DataSource(cfg.scale, cfg.channels, synthetic=True,
                          holdout=holdout, threads=threads)
    path = lfw.default_store_path(cfg.aws, cfg.dataset_dir)
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"packed dataset {path!r} not found; build it with "
            "`python -m facegen.data.lfw --path=/path/to/lfw` or pass "
            "--syntheticData"
        )
    return DataSource(cfg.scale, cfg.channels, store=lfw.load_store(path),
                      holdout=holdout, threads=threads)
