"""Dataset scanning, splitting and batched loading.

Behavioral parity with the reference loader factories
(/root/reference/src/datasets/utils.py):

* directory scan and sorted filename pairing (:54-65, :100-112);
* optional subsampling via sampling WITH replacement (:19, :67, :114 —
  the reference uses ``random.choices``; preserved, it changes few-shot
  semantics) and shuffling;
* split by ``split_ratio`` with the len==2 → 1/1 special case
  (:120-125);
* per-mode batch size / num-samples selection (:179-191, transforms.py
  :348-360);
* pretrain/supervised loaders drop the last partial batch; downstream
  keeps it; test loader is batch 1, unshuffled, full volumes (:169-176).

TPU-first loading: transform work runs in a thread pool (numpy releases
the GIL for the heavy ops) with double-buffered prefetch so host
preprocessing overlaps device compute; batches are dict-of-ndarray,
channels-last, ready for a single ``device_put``.
"""

from __future__ import annotations

import math
import queue
import random
import threading
from collections import deque as collections_deque
from pathlib import Path
from typing import Callable, Dict, List

import numpy as np

from . import transforms as T


def num_samples_of(conf) -> int:
    mode = conf.training_mode
    if mode == "downstream":
        return conf.num_samples_downstream
    if mode == "self_supervised_learning_encoder":
        return conf.num_samples_multi_view
    return conf.num_samples_students_teacher


def batch_size_of(conf) -> int:
    mode = conf.training_mode
    if mode == "downstream":
        return conf.batch_size_downstream
    if mode == "self_supervised_learning_encoder":
        return conf.batch_size_multi_view
    return conf.batch_size_students_teacher


def _scan_pairs(image_dir, mask_dir, image_key="image", mask_key="mask"):
    image_paths = sorted(Path(image_dir).iterdir())
    mask_paths = sorted(Path(mask_dir).iterdir())
    return [{image_key: str(i), mask_key: str(m), "name": Path(i).stem}
            for i, m in zip(image_paths, mask_paths)]


def _scan_images(image_dir, image_key="image"):
    return [{image_key: str(p), "name": p.stem}
            for p in sorted(Path(image_dir).iterdir())]


def _rng_of(conf) -> random.Random:
    """Data-selection RNG: seeded when the config carries a ``seed`` so
    subsample/split are reproducible (the reference uses the unseeded
    global ``random`` module — utils.py:19,67,114; the ``seed`` config
    key is a new capability of this framework)."""
    seed = getattr(conf, "seed", None)
    if seed is None:
        return random  # type: ignore[return-value]
    return random.Random(int(seed))


def _subsample(data: List[Dict], k: int, rng=random) -> List[Dict]:
    if k != -1:
        # random.choices — WITH replacement, as the reference does.
        data = rng.choices(data, k=k)
        print(f"Selected {len(data)} samples.")
    return data


def _split(data: List[Dict], split_ratio: float, downstream: bool = False,
           rng=random):
    rng.shuffle(data)
    if downstream:
        if len(data) < 2:
            raise ValueError("Not enough samples for downstream task.")
        split_index = 1 if len(data) == 2 else \
            math.floor(len(data) * split_ratio)
    else:
        split_index = math.floor(len(data) * split_ratio)
    return data[:split_index], data[split_index:]


class Dataset:
    """Transform-on-access dataset: items are dicts of file paths.

    With ``seed=None`` (parity with the reference's unseeded pipeline)
    per-item transform randomness is salted from the global ``random``
    module; with an integer seed the stream is fully deterministic per
    (seed, epoch, idx) — the loader advances ``epoch`` each iteration so
    crops still vary across epochs.
    """

    def __init__(self, data: List[Dict], transform: Callable,
                 seed: int = None):
        self.data = data
        self.transform = transform
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> List[Dict]:
        """Returns a LIST of samples (crop samples per volume)."""
        if self.seed is None:
            entropy = [0, idx, random.getrandbits(31)]
        else:
            entropy = [int(self.seed), self.epoch, idx]
        rng = np.random.default_rng(np.random.SeedSequence(entropy))
        out = self.transform(self.data[idx], rng)
        return out if isinstance(out, list) else [out]


class DataLoader:
    """Shuffled, multi-threaded, prefetching batch iterator."""

    def __init__(self, dataset: Dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 2, drop_last: bool = False,
                 prefetch: int = 2, samples_per_item: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.samples_per_item = max(samples_per_item, 1)

    def __len__(self):
        """True batch count per epoch (each dataset item yields
        ``samples_per_item`` crop samples; the producer re-batches the
        flattened sample stream)."""
        total = len(self.dataset) * self.samples_per_item
        if self.drop_last:
            return total // self.batch_size
        return math.ceil(total / self.batch_size)

    def _produce(self, order, q):
        """Transform items in a worker pool; emit batches in order."""
        from concurrent.futures import ThreadPoolExecutor
        try:
            buffer: List[Dict] = []
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                # Keep ~2x workers of items in flight, consume in order.
                futures = collections_deque()
                it = iter(order)
                for _ in range(2 * self.num_workers):
                    idx = next(it, None)
                    if idx is None:
                        break
                    futures.append(pool.submit(self.dataset.__getitem__, idx))
                while futures:
                    buffer.extend(futures.popleft().result())
                    idx = next(it, None)
                    if idx is not None:
                        futures.append(
                            pool.submit(self.dataset.__getitem__, idx))
                    while len(buffer) >= self.batch_size:
                        batch, buffer = (buffer[:self.batch_size],
                                         buffer[self.batch_size:])
                        q.put(_collate(batch))
            if buffer and not self.drop_last:
                q.put(_collate(buffer))
        except Exception as e:  # propagate to consumer
            q.put(e)
        finally:
            q.put(None)

    def __iter__(self):
        self.dataset.set_epoch(self.dataset.epoch + 1)
        order = list(range(len(self.dataset)))
        if self.shuffle:
            if self.dataset.seed is None:
                random.shuffle(order)
            else:
                random.Random((int(self.dataset.seed) << 20)
                              + self.dataset.epoch).shuffle(order)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(order, q),
                             daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def _collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    batch: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals  # names
    return batch


# ------------------------------------------------------ loader factories

def get_fit_loader_self_supervised_learning(conf):
    rng = _rng_of(conf)
    data = _subsample(_scan_images(conf.image_dir_pretrain,
                                   conf.image_dict_key),
                      conf.num_selected_data_pretrain, rng)
    train_data, val_data = _split(data, conf.split_ratio, rng=rng)
    tf = lambda item, rng: T.transform_pretrain_fit(item, conf, rng)
    bs = batch_size_of(conf)
    mk = lambda d: DataLoader(Dataset(d, tf, seed=getattr(conf, 'seed', None)), bs, shuffle=True,
                              num_workers=conf.num_workers, drop_last=True,
                              samples_per_item=num_samples_of(conf))
    return mk(train_data), mk(val_data)


def get_fit_loader_supervised_learning(conf):
    rng = _rng_of(conf)
    data = _subsample(_scan_pairs(conf.image_dir_supervised,
                                  conf.mask_dir_supervised,
                                  conf.image_dict_key, conf.mask_dict_key),
                      conf.num_selected_data_supervised, rng)
    train_data, val_data = _split(data, conf.split_ratio, rng=rng)
    tf = lambda item, rng: T.transform_pretrain_fit(item, conf, rng)
    bs = batch_size_of(conf)
    mk = lambda d: DataLoader(Dataset(d, tf, seed=getattr(conf, 'seed', None)), bs, shuffle=True,
                              num_workers=conf.num_workers, drop_last=True,
                              samples_per_item=num_samples_of(conf))
    return mk(train_data), mk(val_data)


def get_fit_loader_downstream(conf):
    rng = _rng_of(conf)
    data = _subsample(_scan_pairs(conf.image_dir_downstream,
                                  conf.mask_dir_downstream,
                                  conf.image_dict_key, conf.mask_dict_key),
                      conf.num_selected_data_downstream, rng)
    train_data, val_data = _split(data, conf.split_ratio, downstream=True,
                                  rng=rng)
    tf = lambda item, rng: T.transform_downstream_fit(item, conf, rng)
    bs = batch_size_of(conf)
    mk = lambda d: DataLoader(Dataset(d, tf, seed=getattr(conf, 'seed', None)), bs, shuffle=True,
                              num_workers=conf.num_workers, drop_last=False,
                              samples_per_item=num_samples_of(conf))
    return mk(train_data), mk(val_data)


def get_test_loader_downstream(conf):
    data = _scan_pairs(conf.image_dir_test, conf.mask_dir_test,
                       conf.image_dict_key, conf.mask_dict_key)
    tf = lambda item, rng: T.transform_downstream_test(item, conf)
    return DataLoader(Dataset(data, tf, seed=getattr(conf, 'seed', None)),
                      batch_size=1, shuffle=False,
                      num_workers=conf.num_workers, drop_last=False)
