"""Batched, padded, device-prefetched input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader`` with
pad-to-batch-max collate (reference: models/baseline.py:133-149,
models/attention.py:303-323). Worker parallelism uses a thread pool (image
decode is C code that releases the GIL); ``device_prefetch`` keeps the
next batch in flight to HBM so the accelerator never waits on host IO.

Collate semantics preserved from the reference:
 - captions are padded with the vocabulary's <pad> id to the longest
   caption in the batch (pad_sequence, baseline.py:137-139)
 - attention-driver caption_lengths are computed *after* padding so they
   are uniform per batch (attention.py:311-313) — we reproduce that by
   returning the padded length for every row.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Batch(dict):
    """Dict-like batch with attribute access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None


def pad_captions(captions, pad_idx, max_len=None):
    """Pad a list of 1-D int arrays to (B, T) with pad_idx."""
    if max_len is None:
        max_len = max(len(c) for c in captions)
    out = np.full((len(captions), max_len), pad_idx, dtype=np.int32)
    for i, c in enumerate(captions):
        out[i, : len(c)] = c[:max_len]
    return out


class DataLoader:
    """Shuffled, batched iterator over a COCODataset.

    Args:
        dataset: COCODataset (or anything indexable returning the same
            tuple structure).
        batch_size: Batch size.
        shuffle: Reshuffle indices every epoch.
        num_workers: Thread-pool width for parallel item loading.
        pad_idx: Padding token id.
        drop_last: Drop the trailing partial batch. TPU programs are
            compiled per shape, so training keeps static batch shapes by
            default (drop_last=True); eval pads the final batch instead.
        pad_to_multiple: Round the padded caption length up to a multiple
            (reduces XLA recompiles across batches; 0 disables).
        seed: Shuffle seed.
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=0,
                 pad_idx=0, drop_last=True, pad_to_multiple=8, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.pad_idx = pad_idx
        self.drop_last = drop_last
        self.pad_to_multiple = pad_to_multiple
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _padded_len(self, captions):
        max_len = max(len(c) for c in captions)
        m = self.pad_to_multiple
        if m:
            max_len = ((max_len + m - 1) // m) * m
        return max_len

    def _collate(self, items):
        is_val = len(items[0]) == 4
        with_ids = len(items[0]) == 3  # train mode + dataset.return_ids
        imgs = np.stack([item[0] for item in items], axis=0)
        captions = [item[1] for item in items]
        max_len = self._padded_len(captions)
        caption_lengths = np.asarray([len(c) for c in captions], np.int32)
        padded = pad_captions(captions, self.pad_idx, max_len)
        batch = Batch(imgs=imgs, captions=padded,
                      caption_lengths=caption_lengths,
                      # Reference attention collate measures lengths after
                      # padding -> uniform per batch (attention.py:311-313).
                      padded_lengths=np.full(len(items), max_len, np.int32))
        if is_val:
            batch["img_paths"] = [item[2] for item in items]
            batch["all_captions"] = [item[3] for item in items]
        if with_ids:
            batch["img_ids"] = [item[2] for item in items]
        return batch

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = self._rng.permutation(n)
        self._epoch += 1

        batches = [order[i: i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 1:
            for idxs in batches:
                yield self._collate([self.dataset[int(i)] for i in idxs])
            return

        with ThreadPoolExecutor(self.num_workers) as pool:
            # Pipeline: submit the next batch's item futures while the
            # current batch is being consumed downstream.
            pending = []
            DEPTH = 2
            bi = 0
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < DEPTH:
                    idxs = batches[bi]
                    pending.append(
                        [pool.submit(self.dataset.__getitem__, int(i))
                         for i in idxs])
                    bi += 1
                futs = pending.pop(0)
                yield self._collate([f.result() for f in futs])


def eval_workers():
    """Loader thread-pool width for the eval drivers.

    The reference evaluates at batch 1 with no loader workers
    (models/baseline.py:267-374), so there is no flag to mirror; the
    host image decode is the measured bottleneck of the batched eval
    loop on few-core hosts (NOTES.md "acceptance rehearsal"), so the
    width follows the core count (min 2 keeps decode overlapped with
    the device step even on a 1-core container; capped at 32 — the
    DEPTH=2 loader pipeline can only keep ~2 batches of item futures
    outstanding, so a 128-thread pool on a many-core host is pure
    overhead). ICD_TPU_EVAL_WORKERS overrides; a malformed value falls
    back to the default."""
    import os

    env = os.environ.get("ICD_TPU_EVAL_WORKERS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return min(32, max(2, os.cpu_count() or 1))


def snap_eval_batch(dataset_len, batch_size):
    """Clamp the eval device batch to a power-of-two tier covering the
    dataset, so dataset size doesn't mint unique XLA shapes."""
    return min(batch_size, 1 << max(0, dataset_len - 1).bit_length())


def pad_batch_to(arrays, batch_size):
    """Pad each array's leading dim to batch_size by repeating the last
    row (static shapes for the final partial eval batch); returns the
    padded arrays plus the valid count."""
    valid = arrays[0].shape[0]
    if valid == batch_size:
        return list(arrays) + [valid]
    reps = batch_size - valid
    return [np.concatenate([a, np.repeat(a[-1:], reps, axis=0)])
            for a in arrays] + [valid]


class DeviceImageCache:
    """Device-resident unique-image cache for per-caption training loops.

    The dataset samples one item per *caption*, so every image's pixels
    recur ~5x per epoch (414,113 captions / 82,783 train images,
    reference: dataset.py:73-75) — and the reference re-ships them to
    the device every time (``imgs.to(device)`` per batch,
    models/baseline.py:214-215). TPU-natively the image set is immutable
    input data: keep one uint8 copy of each distinct image in HBM and
    gather the batch by index on device, so each image crosses the
    host->HBM link ONCE per epoch (~12.5 GB instead of ~62 GB at the
    COCO-2014 scale). Bit-identical training: the gathered rows are the
    same pixels in the same batch order, so every loss matches the
    direct-ship path exactly (tests/test_device_image_cache.py).

    Protocol: enable ``dataset.return_ids``, then ``rewrite(batch)``
    each collated batch. It returns the batch with ``imgs`` replaced by

      fresh_imgs  (k, H, W, C) uint8 — only the images not yet in HBM,
                  padded to a power-of-two bucket k (stable XLA shapes;
                  pad rows target the scratch slot, see below)
      fresh_slots (k,) int32 — buffer rows to write them to
      idx         (B,) int32 — per-sample buffer row to gather

    and the train step fuses insert + gather + step in ONE dispatch:

        def step(..., buf, fresh_slots, fresh_imgs, idx, captions):
            buf = buf.at[fresh_slots].set(fresh_imgs)   # donated
            imgs = buf[idx]
            ...
            return ..., buf

    ``init_buffer()`` allocates ``capacity + 1`` rows; the extra row is
    a scratch slot that bucket-padding entries write garbage to and
    nothing ever gathers. When the budget is smaller than the image set,
    slots are reused round-robin — never evicting an image that appears
    in the current batch (the gather would read the overwriting image's
    pixels otherwise).
    """

    def __init__(self, budget_gb, img_shape, batch_size, max_images=None):
        row_bytes = int(np.prod(img_shape))
        self.capacity = max(
            int(batch_size), int(budget_gb * (1 << 30)) // row_bytes)
        if max_images is not None:
            # Never allocate more rows than distinct images exist.
            self.capacity = max(int(batch_size),
                                min(self.capacity, int(max_images)))
        self.img_shape = tuple(img_shape)
        self.batch_size = int(batch_size)
        self.slot_of = {}     # img_id -> slot
        self.slot_owner = {}  # slot -> img_id (for round-robin eviction)
        self.next_slot = 0
        self.hits = 0
        self.misses = 0

    def init_buffer(self, sharding=None):
        """(capacity + 1, H*W*C) uint8 device buffer (last row = scratch
        for bucket padding).

        Rows are FLAT: a (N, 224, 224, 3) uint8 buffer pads its minor
        dims to TPU tile boundaries (measured 11.61 -> 13.26 GB) and the
        in-program relayout defeated scatter aliasing — the compiler
        materialized a second full-size HLO temp and the COCO-sized
        buffer OOM'd at compile (25.2 GB demand on a 16 GB chip). The
        flat (N, 150528) form is tile-aligned (150528 % 128 == 0), and
        the fused scatter+gather step compiles and runs in place at full
        COCO size (probed on-chip). Gather consumers reshape rows back
        to (H, W, C)."""
        import jax
        import jax.numpy as jnp

        row = int(np.prod(self.img_shape))
        buf = jnp.zeros((self.capacity + 1, row), jnp.uint8)
        if sharding is not None:
            buf = jax.device_put(buf, sharding)
        return buf

    def _assign_slot(self, img_id, batch_ids):
        """Round-robin slot for a new image, skipping slots whose owner
        is referenced by the current batch."""
        for _ in range(self.capacity + self.batch_size):
            slot = self.next_slot % self.capacity
            self.next_slot += 1
            owner = self.slot_owner.get(slot)
            if owner is None or owner not in batch_ids:
                if owner is not None:
                    del self.slot_of[owner]
                self.slot_of[img_id] = slot
                self.slot_owner[slot] = img_id
                return slot
        raise RuntimeError("DeviceImageCache: no evictable slot "
                           "(capacity {} < distinct images in one "
                           "batch?)".format(self.capacity))

    @staticmethod
    def _bucket(n):
        k = 1
        while k < n:
            k *= 2
        return k

    def gather(self, buf, idx):
        """Jit-traceable: gather ``idx`` rows and restore (B, H, W, C)."""
        return buf[idx].reshape((idx.shape[0],) + self.img_shape)

    def insert(self, buf, fresh_slots, fresh_imgs):
        """Jit-traceable: scatter flat fresh rows into the buffer."""
        return buf.at[fresh_slots].set(fresh_imgs)

    def rewrite(self, batch):
        """Split a collated train batch (imgs + img_ids) into the
        insert+gather form documented on the class."""
        ids = batch.pop("img_ids")
        imgs = batch.pop("imgs")
        batch_ids = set(ids)
        fresh_pos, fresh_slots = [], []
        for i, img_id in enumerate(ids):
            if img_id in self.slot_of:
                self.hits += 1
                continue
            fresh_pos.append(i)
            fresh_slots.append(self._assign_slot(img_id, batch_ids))
            self.misses += 1
        k = self._bucket(max(len(fresh_pos), 1))
        pad = k - len(fresh_pos)
        # Padding rows write the first image's pixels into the scratch
        # slot (row ``capacity``): shipped but never gathered.
        fresh_imgs = imgs[(fresh_pos + [0] * pad)]
        slots = np.asarray(fresh_slots + [self.capacity] * pad, np.int32)
        batch["fresh_imgs"] = np.ascontiguousarray(
            fresh_imgs).reshape(k, -1)  # flat rows, see init_buffer
        batch["fresh_slots"] = slots
        batch["idx"] = np.asarray(
            [self.slot_of[i] for i in ids], np.int32)
        return batch


def device_image_cache_from_env(dataset, batch_size):
    """DeviceImageCache from ICD_TPU_DEVICE_IMAGE_CACHE (GB; 0/unset/
    malformed = off). Flips the dataset into return_ids mode."""
    import os

    try:
        gb = float(os.environ.get("ICD_TPU_DEVICE_IMAGE_CACHE", "0") or 0)
    except ValueError:
        gb = 0.0
    if gb <= 0:
        return None
    dataset.return_ids = True
    shape = (dataset.img_size, dataset.img_size, 3)
    return DeviceImageCache(gb, shape, batch_size,
                            max_images=len(getattr(dataset, "img_ids",
                                                   []) or []) or None)


def cached_batches(loader, img_cache, mesh, size=2):
    """Producer-thread pipeline for the DeviceImageCache train path:
    rewrite each collated batch into insert+gather form and place the
    leaves (batch-dim leaves sharded over 'data', fresh-insert leaves
    replicated) — the cache-path counterpart of device_prefetch.
    ``loader`` is any iterable of collated train batches carrying
    ``img_ids`` (a DataLoader over a return_ids dataset, optionally
    wrapped by the BERT producer)."""
    import jax

    from ..parallel.mesh import batch_sharding, replicated

    n_data = mesh.shape.get("data", 1)
    repl = replicated(mesh)
    batch_keys = ("idx", "captions", "caption_lengths", "padded_lengths",
                  "embeddings")

    def gen():
        for b in iter(loader):
            b = img_cache.rewrite(b)
            out = Batch()
            for key, v in b.items():
                if not isinstance(v, np.ndarray):
                    out[key] = v
                elif key in batch_keys and v.shape[0] % n_data == 0:
                    out[key] = jax.device_put(
                        v, batch_sharding(mesh, v.ndim))
                else:
                    out[key] = jax.device_put(v, repl)
            yield out

    return host_prefetch(gen(), size=size)


def host_prefetch(iterator, size=2):
    """Run ``iterator`` on a background thread, queueing its items.

    Generic producer/consumer overlap with the same abandonment-safe
    drain protocol as device_prefetch; use it when the caller wants to
    control device placement itself (e.g. the eval loops ship images to
    HBM on the producer thread but keep captions host-side for the
    reference-protocol cleanup)."""
    q = queue.Queue(maxsize=size)
    _SENTINEL = object()
    stop = threading.Event()

    def producer():
        try:
            for item in iterator:
                if stop.is_set():
                    break
                q.put(item)
            q.put(_SENTINEL)
        except BaseException as exc:  # propagate to the consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                thread.join(0.01)


def device_prefetch(iterator, size=2, sharding=None):
    """Prefetch host batches into device memory (double buffering).

    Transfers run on a background thread via jax.device_put so the next
    batch lands in HBM while the current step computes — the TPU-native
    replacement for the reference's per-batch ``.to(device)``
    (attention.py:389-390).

    Args:
        iterator: Yields pytrees of numpy arrays (non-array leaves pass
            through untransferred).
        size: Queue depth.
        sharding: Optional jax.sharding.Sharding applied to every array
            leaf, or a callable (ndarray -> Sharding) for per-leaf
            layouts (e.g. batch-sharded on axis 0 whatever the rank).
    """
    import jax

    def _put(batch):
        def leaf(x):
            # Device-resident producers (e.g. the device BERT embedder)
            # yield jax arrays on the default device; reshard them here
            # on the producer thread so the train step gets the same
            # mesh layout as the numpy leaves instead of paying an
            # XLA-inserted reshard every step (None sharding leaves
            # already-placed jax arrays where they are).
            if isinstance(x, np.ndarray) or (
                    isinstance(x, jax.Array) and sharding is not None):
                s = sharding(x) if callable(sharding) else sharding
                return jax.device_put(x, s)
            if isinstance(x, dict):
                return type(x)({k: leaf(v) for k, v in x.items()})
            return x

        return leaf(batch)

    q = queue.Queue(maxsize=size)
    _SENTINEL = object()
    stop = threading.Event()

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    break
                q.put(_put(batch))
            q.put(_SENTINEL)
        except BaseException as exc:  # propagate to the consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # Consumer abandoned the generator (error mid-epoch, partial
        # consumption): unblock the producer and drain its queued
        # device batches so they don't stay pinned in HBM for the
        # process lifetime.
        stop.set()
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                thread.join(0.01)
