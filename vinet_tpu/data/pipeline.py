"""Host loader: thread-pool decode + prefetch; normalization on device.

Replaces torch DataLoader worker forks (/root/reference/train.py:138-139,
num_workers=4) with a thread pool (PIL decode releases the GIL) and a
bounded prefetch queue. Batches are stacked numpy; `device_preprocess` does
uint8 -> float -> ImageNet normalization as part of the jitted step, so the
host ships 4x fewer bytes than the reference's float32 tensors.

Determinism: a seeded numpy Generator per epoch drives both the shuffle and
every random window choice — resume-stable, host-count shardable
(shard=(rank, world) slices the index set per host).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax.numpy as jnp

from vinet_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


def device_preprocess(clip_u8):
    """(B,T,H,W,3) uint8 -> normalized float. jit-safe; runs on device."""
    x = clip_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def _stack(items):
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class Loader:
    def __init__(self, dataset, *, batch_size, shuffle=False, num_workers=4,
                 seed=0, drop_last=True, shard=(0, 1), prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.shard = shard
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        rank, world = self.shard
        n = len(range(rank, len(self.dataset), world))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        rank, world = self.shard
        rng = np.random.default_rng((self.seed, self.epoch))
        self.epoch += 1
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idx)
        idx = idx[rank::world]

        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    seeds = [np.random.default_rng((self.seed, self.epoch, int(i))) for i in b]
                    items = list(pool.map(self.dataset.get, b, seeds))
                    q.put(_stack(items))
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
