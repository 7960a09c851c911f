"""Host-side data loading: samplers, collation, threaded prefetch.

TPU-first design: the loader produces fixed-shape NHWC numpy batches on a
background thread pool and (optionally) stages them onto the device mesh so
host preprocessing overlaps device steps. Replaces torch DataLoader +
WeightedRandomSampler (reference data/__init__.py:113-132).
"""

from __future__ import annotations

import numpy as np


class WeightedMixture:
    """ConcatDataset + WeightedRandomSampler(replacement=True) equivalent.

    ``datasets`` with per-DATASET weights applied per-sample, exactly like
    the reference's per-sample weight lists [0.2, 10, 1]
    (data/__init__.py:113-120).
    """

    def __init__(self, datasets, weights, seed: int = 0):
        self.datasets = list(datasets)
        per_sample = np.concatenate([
            np.full(len(d), w, np.float64)
            for d, w in zip(self.datasets, weights)])
        self.p = per_sample / per_sample.sum()
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return int(self.offsets[-1])

    def sample_index(self):
        flat = int(self.rng.choice(len(self.p), p=self.p))
        ds_idx = int(np.searchsorted(self.offsets, flat, side="right") - 1)
        return ds_idx, flat - int(self.offsets[ds_idx])

    def get(self, epoch: int = 0):
        ds_idx, local = self.sample_index()
        return self.datasets[ds_idx].__getitem__(local, epoch=epoch)


def collate(samples):
    """Stack same-shape samples into a batch dict. Ragged 'gt' (detection
    dicts) stays a list; None 'gt'/'hq' are dropped."""
    out = {}
    first = samples[0]
    for key in ("lq", "hq"):
        if first.get(key) is not None:
            out[key] = np.stack([s[key] for s in samples]).astype(np.float32)
    gt = [s.get("gt") for s in samples]
    if gt[0] is not None:
        if isinstance(gt[0], (np.ndarray, np.integer, int)) and not \
                isinstance(gt[0], dict):
            out["gt"] = np.stack([np.asarray(g) for g in gt])
        else:
            out["gt"] = gt
    out["fname"] = [s["fname"] for s in samples]
    out["task"] = first["task"]
    return out


class DataLoader:
    """Minimal iterator over a dataset or WeightedMixture.

    - shuffle/sequential or weighted-with-replacement sampling
    - drop_last for fixed shapes (no recompiles)
    - background thread prefetch (``num_workers`` threads decode/corrupt
      ahead; with replacement sampling the stream is infinite)
    """

    def __init__(self, source, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 0,
                 prefetch: int = 4, seed: int = 0, infinite: bool = False):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.infinite = infinite or isinstance(source, WeightedMixture)
        self.epoch = 0

    def __len__(self):
        n = len(self.source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, idx):
        if isinstance(self.source, WeightedMixture):
            return self.source.get(self.epoch)
        return self.source.__getitem__(idx, epoch=self.epoch)

    def _index_stream(self):
        if self.infinite:
            while True:
                yield -1
        else:
            n = len(self.source)
            order = np.arange(n)
            if self.shuffle:
                np.random.default_rng(self.seed + self.epoch).shuffle(order)
            yield from order.tolist()

    def __iter__(self):
        if self.num_workers <= 0:
            yield from self._iter_sync()
        else:
            yield from self._iter_threaded()
        self.epoch += 1

    def _iter_sync(self):
        buf = []
        for idx in self._index_stream():
            buf.append(self._fetch(idx))
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)

    def _iter_threaded(self):
        """True worker-pool prefetch: ``num_workers`` threads decode/corrupt
        samples concurrently (numpy/cv2 and the native corruption kernels
        release the GIL), batches are assembled in order. Sampling decisions
        (weighted draws / shuffle order) stay on the consumer thread, so the
        stream is identical to the synchronous iterator; per-sample work is
        deterministic via index-seeded RNGs (datasets.py ``_Base.rng``)."""
        from concurrent.futures import ThreadPoolExecutor

        def draw(idx):
            """Resolve the sample identity on this (consumer) thread."""
            if isinstance(self.source, WeightedMixture):
                ds_idx, local = self.source.sample_index()
                return self.source.datasets[ds_idx], local
            return self.source, idx

        import collections
        depth = max(self.num_workers,
                    self.prefetch * max(1, self.batch_size))
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            futures: collections.deque = collections.deque()
            stream = self._index_stream()
            exhausted = False

            def refill():
                nonlocal exhausted
                while not exhausted and len(futures) < depth:
                    try:
                        idx = next(stream)
                    except StopIteration:
                        exhausted = True
                        return
                    ds, local = draw(idx)
                    futures.append(pool.submit(ds.__getitem__, local,
                                               epoch=self.epoch))

            refill()
            buf = []
            while futures:
                buf.append(futures.popleft().result())
                refill()
                if len(buf) == self.batch_size:
                    yield collate(buf)
                    buf = []
            if buf and not self.drop_last:
                yield collate(buf)
        finally:
            # abandoning the iterator early (break / Ctrl-C) must not block
            # on ~depth in-flight decode jobs — drop everything not started
            pool.shutdown(wait=False, cancel_futures=True)


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Overlap host batch production with device execution by staging
    ``depth`` batches onto the device ahead of consumption."""
    import collections

    import jax

    buf = collections.deque()

    def put(b):
        arrays = {k: v for k, v in b.items()
                  if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in b.items() if k not in arrays}
        if sharding is not None:
            arrays = {k: jax.device_put(v, sharding)
                      for k, v in arrays.items()}
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        return {**arrays, **rest}

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
