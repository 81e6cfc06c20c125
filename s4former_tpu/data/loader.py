"""Semi-supervised batch loader: sampler + worker pool + device feed.

Rebuild of the reference's loader stack
(reference: mmseg/datasets/samplers/semi_sampler.py:9-150 fixed-ratio
sampling, builder.py:116-309 flattening collate + worker seeding) —
restructured TPU-first:

- ``SemiBalanceSampler``: infinite stream of (sup_indices, unsup_indices)
  with a fixed per-batch ratio (4+4 in the paper configs), reshuffling each
  source independently when exhausted, seeded per epoch like the reference
  (:64-143). Rank-strided splitting is unnecessary: one host feeds the
  whole global batch and GSPMD shards it across devices.
- ``SemiLoader``: thread-pool pipeline execution + numpy stacking into the
  exact batch dict the jitted train step consumes, with double-buffered
  prefetch so host aug overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from s4former_tpu.registry import SAMPLERS


@SAMPLERS.register_module()
class SemiBalanceSampler:
    """Fixed-ratio multi-source index stream (semi_sampler.py:9-150).

    ``by_prob`` is accepted and ignored — the REFERENCE does the same: the
    flag is stored at semi_sampler.py:35 but never read inside __iter__
    (the WeightedRandomSampler import is dead code). Documented parity,
    not an omission.

    Epoch semantics (reference :66-69 ``g.manual_seed(self.epoch)``): each
    ``__iter__`` pass yields ``max_iter_size`` batches from pools permuted
    by a generator seeded with (seed + epoch); re-iterating (what the
    runner does when the stream ends) advances the epoch, like mmcv's
    ``set_epoch`` between IterBasedRunner passes.
    """

    def __init__(self, num_sup: int, num_unsup: int,
                 sup_per_batch: int, unsup_per_batch: int,
                 seed: int = 0, by_prob: bool = False,
                 num_mix: int = 0,
                 max_iter_size: Optional[int] = None, **kwargs):
        self.num_sup = num_sup
        self.num_unsup = num_unsup
        self.num_mix = num_mix
        self.sup_per_batch = sup_per_batch
        self.unsup_per_batch = unsup_per_batch
        self.seed = seed
        self.max_iter_size = max_iter_size
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple[List[int], List[int], List[int]]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        pools: Dict[str, List[int]] = {'sup': [], 'unsup': [], 'mix': []}
        sizes = {'sup': self.num_sup, 'unsup': self.num_unsup,
                 'mix': self.num_mix}
        counts = {'sup': self.sup_per_batch, 'unsup': self.unsup_per_batch,
                  'mix': self.unsup_per_batch if self.num_mix else 0}
        it = 0
        while self.max_iter_size is None or it < self.max_iter_size:
            draw = {}
            for name in pools:
                n = counts[name]
                if n == 0:
                    draw[name] = []
                    continue
                while len(pools[name]) < n:
                    pools[name].extend(rng.permutation(sizes[name]).tolist())
                draw[name] = [pools[name].pop(0) for _ in range(n)]
            yield draw['sup'], draw['unsup'], draw['mix']
            it += 1


def _stack_tagged(items, default_tag: str) -> Dict[str, np.ndarray]:
    """Group pipeline outputs by their ``tag`` (ExtraAttrs) and stack.

    Accepts plain result dicts or MultiBranch lists; emits '{tag}_img'
    (f32 NHWC) and '{tag}_gt' (i32) per tag present. This replaces the
    reference's flattening collate + dict_split-by-tag round trip
    (builder.py:295-303, structual_utils.py:49) with one host-side pass.
    """
    groups: Dict[str, list] = {}
    for it in items:
        branches = it if isinstance(it, list) else [it]
        for b in branches:
            groups.setdefault(b.get('tag', default_tag), []).append(b)
    out: Dict[str, np.ndarray] = {}
    for tag, results in groups.items():
        out[f'{tag}_img'] = np.stack([r['img'] for r in results]
                                     ).astype(np.float32)
        if 'gt_semantic_seg' in results[0]:
            out[f'{tag}_gt'] = np.stack(
                [r['gt_semantic_seg'] for r in results]).astype(np.int32)
    return out


class SemiLoader:
    """Iterator of train-step batch dicts.

    sup/unsup datasets are indexed by a SemiBalanceSampler; items run
    through their pipelines in a thread pool (PIL/numpy release the GIL for
    the heavy parts); finished batches wait in a bounded prefetch queue.
    """

    def __init__(self, sup_dataset, unsup_dataset=None,
                 unsup_mix_dataset=None,
                 sup_per_batch: int = 4, unsup_per_batch: int = 4,
                 num_workers: int = 8, prefetch: int = 2, seed: int = 0,
                 max_iter_size: Optional[int] = None):
        """``unsup_mix_dataset`` is the UniMatch third source (reference
        UniSemiDataset, dataset_wrappers.py:308): its MultiBranch pipeline
        tags results 'unsup_teacher_mix'/'unsup_student_mix'/
        'unsup_student_2_mix', which stack into the *_mix_img batch keys
        the unimatch train step consumes."""
        self.sup = sup_dataset
        self.unsup = unsup_dataset
        self.unsup_mix = unsup_mix_dataset
        self.sampler = SemiBalanceSampler(
            len(sup_dataset),
            len(unsup_dataset) if unsup_dataset is not None else 0,
            sup_per_batch,
            unsup_per_batch if unsup_dataset is not None else 0,
            num_mix=(len(unsup_mix_dataset)
                     if unsup_mix_dataset is not None else 0),
            seed=seed, max_iter_size=max_iter_size)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        self._queue: 'queue.Queue' = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _make_batch(self, sup_idx, unsup_idx, mix_idx
                    ) -> Dict[str, np.ndarray]:
        sup_futs = [self.pool.submit(self.sup.__getitem__, i)
                    for i in sup_idx]
        unsup_futs = [self.pool.submit(self.unsup.__getitem__, i)
                      for i in unsup_idx] if self.unsup is not None else []
        mix_futs = [self.pool.submit(self.unsup_mix.__getitem__, i)
                    for i in mix_idx] if self.unsup_mix is not None else []
        batch = _stack_tagged([f.result() for f in sup_futs], 'sup')
        if unsup_futs:
            batch.update(_stack_tagged([f.result() for f in unsup_futs],
                                       'unsup_student'))
        if mix_futs:
            batch.update(_stack_tagged([f.result() for f in mix_futs],
                                       'unsup_student_mix'))
        return batch

    def _producer(self):
        try:
            for sup_idx, unsup_idx, mix_idx in self.sampler:
                if self._stop.is_set():
                    return
                self._queue.put(self._make_batch(sup_idx, unsup_idx,
                                                 mix_idx))
            self._queue.put(None)
        except BaseException as e:  # surface worker errors to the consumer
            self._queue.put(e)

    def __iter__(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._producer,
                                            daemon=True)
            self._thread.start()
        while True:
            batch = self._queue.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch

    def close(self):
        self._stop.set()
        self.pool.shutdown(wait=False)
