"""Multitask dataset mixture + batch iterator.

Replaces ``make_multitask_data_module``/``build_spi_dataset``/
``ConcatDataset`` (reference: gpt4roi/datasets/data_modules.py:58-211):
string-typed dataset registry dispatch, per-dataset ``ratio`` random
subsampling, concatenation, and a static-shape batch loader feeding the
sharded train step (replacing torch DataLoader + DataCollatorForDetDataset).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

import gpt4roi_tpu.data.datasets  # noqa: F401 — populates the DATASETS registry
from gpt4roi_tpu.core.config import load_config
from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data.collate import BatchSpec, collate


class PrefetchLoader:
    """Background-thread prefetch wrapper around any batch loader: keeps up
    to ``depth`` collated batches ready so host-side image decode/pack work
    overlaps device steps (the reference gets this from torch DataLoader
    workers; our loaders are synchronous python)."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error: list = []

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
            except BaseException as e:  # surface loader errors on the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


class SubsetDataset:
    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = indices

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self.indices[i])]


class ConcatDataset:
    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, i: int):
        ds = int(np.searchsorted(self.offsets, i, side="right")) - 1
        return self.datasets[ds][i - int(self.offsets[ds])]


def build_spi_dataset(dataset_config, tokenizer=None, seed: int = 0, **kwargs):
    if isinstance(dataset_config, list):
        return ConcatDataset(
            [build_spi_dataset(c, tokenizer=tokenizer, seed=seed, **kwargs) for c in dataset_config]
    )
    cfg = dict(dataset_config)
    dataset_type = cfg.pop("type")
    ratio = cfg.pop("ratio", 1)
    dataset = DATASETS.get(dataset_type)(tokenizer=tokenizer, **cfg, **kwargs)
    if ratio < 1:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(dataset), int(ratio * len(dataset)), replace=False)
        return SubsetDataset(dataset, idx)
    return dataset


def make_multitask_dataset(dataset_config_path: str, tokenizer, seed: int = 0, **kwargs):
    cfg = load_config(dataset_config_path)
    return build_spi_dataset(list(cfg["spi_datasets"]), tokenizer=tokenizer, seed=seed, **kwargs)


class PackedBatchLoader:
    """Shuffled epoch iterator -> packed static-shape batches (see
    data.packing): draws ``samples_per_batch`` raw samples, bin-packs them
    into rows, and yields the packed tensors + bank indices. Throughput
    scales with 1/(mean fill ratio) vs the padded loader."""

    def __init__(
        self,
        dataset,
        samples_per_batch: int,
        spec,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
    ):
        from gpt4roi_tpu.data.packing import collate_packed

        self._collate = collate_packed
        self.dataset = dataset
        self.samples_per_batch = samples_per_batch
        self.spec = spec
        self.rng = np.random.default_rng(seed)
        self.host_id = host_id
        self.num_hosts = num_hosts

    def __len__(self) -> int:
        return len(self.dataset) // (self.samples_per_batch * self.num_hosts)

    def __iter__(self):
        # all hosts share the seed -> identical permutation; each takes a
        # disjoint stride (multihost data sharding, replacing torchrun's
        # DistributedSampler)
        order = self.rng.permutation(len(self.dataset))[self.host_id :: self.num_hosts]
        n = self.samples_per_batch
        for start in range(0, len(order) - n + 1, n):
            samples = [self.dataset[int(i)] for i in order[start : start + n]]
            yield self._collate(samples, self.spec)


class BatchLoader:
    """Shuffled epoch iterator -> static-shape numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        spec: BatchSpec,
        seed: int = 0,
        drop_last: bool = True,
        host_id: int = 0,
        num_hosts: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.spec = spec
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_hosts
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.rng.permutation(len(self.dataset))[self.host_id :: self.num_hosts]
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            samples = [self.dataset[int(i)] for i in order[start : start + self.batch_size]]
            yield collate(samples, self.spec)
