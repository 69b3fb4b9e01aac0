"""Data loading: reference-protocol files -> static-shape device batches.

Replaces the reference's torch ``CaptionDataset`` + ``DataLoader``
(geo-aware/datasets.py:9-57) with a numpy-backed loader that

  * memory-maps the HDF5 image store and materializes the (small) caption /
    context sidecars as contiguous arrays once,
  * yields fixed-shape batches (partial batches are padded with zero-length
    rows that the masked loss ignores — no dynamic shapes ever reach XLA),
  * optionally runs the frozen image encoder once and caches the 196-token
    image features, so training epochs never re-run ResNet on TPU
    (the reference recomputes it every batch: train.py:269),
  * prefetches the next batch to device while the current step runs.
"""

from __future__ import annotations

import json
import os
import pickle
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from icek_tpu.data import images as image_ops


class CaptionArrays:
    """All non-image data for one split, as padded numpy arrays."""

    def __init__(self, data_dir: str, base_name: str, split: str,
                 has_facts: bool):
        def jload(kind):
            with open(os.path.join(data_dir, f"{split}_{kind}_{base_name}.json")) as f:
                return json.load(f)

        def pload(kind):
            with open(
                os.path.join(data_dir, f"{split}_{kind}_{base_name}.pkl"), "rb"
            ) as f:
                return pickle.load(f)

        self.caption_ids = np.asarray(jload("CAPTIONS"), dtype=np.int32)
        self.lengths = np.asarray(jload("CAPLENS"), dtype=np.int32)
        self.caption_mask = np.asarray(jload("CAPMASKS"), dtype=np.int32)
        self.entity_features = np.asarray(pload("ENT_FEATURES"), dtype=np.float32)
        self.entity_names = np.asarray(pload("ENT_NAMES"), dtype=np.int32)
        self.fact_features = None
        self.fact_names = None
        if has_facts:
            self.fact_features = np.asarray(pload("FACTS"), dtype=np.float32)
            self.fact_names = np.asarray(pload("FACT_NAMES"), dtype=np.int32)
        self.size = len(self.caption_ids)


class CaptionDataset:
    """One split: images (HDF5) + caption/context arrays."""

    def __init__(self, data_dir: str, base_name: str, split: str,
                 has_facts: bool = False):
        import h5py

        self.split = split
        self.arrays = CaptionArrays(data_dir, base_name, split, has_facts)
        self._h5 = h5py.File(
            os.path.join(data_dir, f"{split}_IMAGES_{base_name}.hdf5"), "r"
        )
        self._images = self._h5["images"]
        self.image_tokens: Optional[np.ndarray] = None  # filled by cache step

    def __len__(self):
        return self.arrays.size

    def raw_image_batch(self, idx: np.ndarray) -> np.ndarray:
        """Stored (B, 3, H, W) float16 rows, un-normalized — for pipelines
        that run ``images.normalize_in_graph`` on device (2x smaller upload,
        no host normalize passes)."""
        # h5py fancy indexing requires strictly increasing indices; batches
        # may repeat rows (eval pads partial batches with the last index)
        uniq, inverse = np.unique(np.asarray(idx), return_inverse=True)
        raw = self._images[uniq.tolist()] if len(uniq) > 1 else (
            self._images[int(uniq[0])][None]
        )
        return raw[inverse]

    def image_batch(self, idx: np.ndarray) -> np.ndarray:
        """Model-ready normalized NHWC images for the given indices."""
        return image_ops.normalize_for_model(self.raw_image_batch(idx))

    def cache_image_tokens(self, encode_fn, batch_size: int = 32,
                           dtype=np.float32, raw: bool = False):
        """Run the frozen encoder over the whole split once; afterwards
        batches carry (196, D) token features instead of raw images.

        dtype=float16 halves the cache RAM and every per-batch gather /
        host->device transfer; bf16 training re-rounds the tokens anyway
        (the train step casts to compute dtype on entry), so f16 storage
        of bf16-computed features loses nothing in practice.

        raw=True feeds ``encode_fn`` the stored f16 CHW rows (it must
        normalize in-graph via ``images.normalize_in_graph``) — skips the
        host normalize passes and uploads 2x fewer bytes per chunk."""
        feed = self.raw_image_batch if raw else self.image_batch
        chunks = []
        for start in range(0, len(self), batch_size):
            idx = np.arange(start, min(start + batch_size, len(self)))
            chunks.append(np.asarray(encode_fn(feed(idx))).astype(dtype))
        self.image_tokens = np.concatenate(chunks, axis=0)

    def index_batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                      pad_partial: bool = True, process_index: int = 0,
                      process_count: int = 1) -> Iterator[np.ndarray]:
        """Epoch index batches (uniform shuffle; the streaming dataset
        overrides this with a read-local shuffle).

        With ``process_count > 1`` (multi-host), every process generates the
        SAME global batch stream (seeded identically) and yields only its
        ``batch_size // process_count``-row slice of each batch — the union
        across processes is exactly the single-process epoch, and
        ``parallel/mesh.py::global_batch`` reassembles each global batch
        from the per-process slices."""
        batches = batch_indices(len(self), batch_size, shuffle, seed, pad_partial)
        return process_local_slices(batches, process_index, process_count)

    def epoch_batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                      pad_partial: bool = True, with_images: bool = True,
                      raw_images: bool = False,
                      process_index: int = 0, process_count: int = 1,
                      start_batch: int = 0):
        """Ready batch dicts for one epoch (the uniform interface the train
        loop consumes; the streaming dataset implements it with sequential
        range reads + a windowed shuffle).  ``batch_size`` is the GLOBAL
        batch size; with ``process_count > 1`` each dict holds this
        process's ``batch_size // process_count`` rows of it.
        ``raw_images`` yields the stored f16 CHW rows for in-graph
        normalization (see :meth:`batch`).  ``start_batch`` skips the first
        batches of the (deterministically seeded) epoch without
        materializing them — mid-epoch resume (train/loop.py)."""
        for j, idx in enumerate(
            self.index_batches(batch_size, shuffle, seed, pad_partial,
                               process_index, process_count)
        ):
            if j < start_batch:
                continue
            yield self.batch(idx, with_images=with_images,
                             raw_images=raw_images)

    def batch(self, idx: np.ndarray, with_images: bool = True,
              raw_images: bool = False) -> Dict[str, np.ndarray]:
        a = self.arrays
        pad = idx < 0                             # -1 marks padding rows
        safe = np.where(pad, 0, idx)
        out = {
            "caption_ids": a.caption_ids[safe],
            "caption_mask": a.caption_mask[safe],
            "lengths": np.where(pad, 0, a.lengths[safe]),
            "entity_features": a.entity_features[safe],
        }
        if a.fact_features is not None:
            out["fact_features"] = a.fact_features[safe]
        if with_images:
            if getattr(self, "use_token_rows", False):
                # device-resident token cache: ship row ids, gather in-graph
                out["token_rows"] = safe.astype(np.int32)
            elif self.image_tokens is not None:
                out["image_tokens"] = self.image_tokens[safe]
            elif raw_images:
                # stored f16 CHW rows; consumer normalizes in-graph
                out["raw_images"] = self.raw_image_batch(safe)
            else:
                out["images"] = self.image_batch(safe)
        return out


def batch_indices(
    n: int, batch_size: int, shuffle: bool, seed: int = 0, pad_partial: bool = True
) -> Iterator[np.ndarray]:
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if not pad_partial:
                return
            idx = np.concatenate([idx, np.full(batch_size - len(idx), -1)])
        yield idx


def process_local_slices(batches: Iterator[np.ndarray], process_index: int,
                         process_count: int) -> Iterator[np.ndarray]:
    """This process's rows of each global index batch.

    All processes iterate the identical (identically-seeded) global stream;
    process p keeps rows [p*B/P, (p+1)*B/P) of every batch.  Union over p ==
    the global stream, and the slices concatenate back in process order —
    the layout ``jax.make_array_from_process_local_data`` expects when the
    mesh's data axis enumerates devices in process order (the
    ``jax.devices()`` default)."""
    if process_count == 1:
        yield from batches
        return
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    for idx in batches:
        if len(idx) % process_count:
            raise ValueError(
                f"global batch size {len(idx)} is not divisible by "
                f"process count {process_count}"
            )
        local = len(idx) // process_count
        yield idx[process_index * local : (process_index + 1) * local]


def prefetch(iterator, put_fn, depth: int = 2):
    """Run `put_fn` (e.g. device transfer) on a background thread, keeping
    `depth` batches in flight — the data/compute overlap the reference gets
    from DataLoader workers (train.py:142-165), minus the processes."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(put_fn(item))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
