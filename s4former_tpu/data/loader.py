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
    """Fixed-ratio two-source index stream (semi_sampler.py:9-150)."""

    def __init__(self, num_sup: int, num_unsup: int,
                 sup_per_batch: int, unsup_per_batch: int,
                 seed: int = 0, by_prob: bool = False,
                 max_iter_size: Optional[int] = None, **kwargs):
        self.num_sup = num_sup
        self.num_unsup = num_unsup
        self.sup_per_batch = sup_per_batch
        self.unsup_per_batch = unsup_per_batch
        self.seed = seed
        self.max_iter_size = max_iter_size

    def __iter__(self) -> Iterator[Tuple[List[int], List[int]]]:
        rng = np.random.default_rng(self.seed)
        sup_pool: List[int] = []
        unsup_pool: List[int] = []
        it = 0
        while self.max_iter_size is None or it < self.max_iter_size:
            while len(sup_pool) < self.sup_per_batch:
                sup_pool.extend(rng.permutation(self.num_sup).tolist())
            while len(unsup_pool) < self.unsup_per_batch:
                unsup_pool.extend(rng.permutation(self.num_unsup).tolist())
            sup_idx = [sup_pool.pop(0) for _ in range(self.sup_per_batch)]
            unsup_idx = [unsup_pool.pop(0)
                         for _ in range(self.unsup_per_batch)]
            yield sup_idx, unsup_idx
            it += 1


def _stack_sup(items) -> Dict[str, np.ndarray]:
    return {
        'sup_img': np.stack([it['img'] for it in items]).astype(np.float32),
        'sup_gt': np.stack([it['gt_semantic_seg'] for it in items]
                           ).astype(np.int32),
    }


def _stack_unsup(branch_lists) -> Dict[str, np.ndarray]:
    """Each item is [student_results, teacher_results] from MultiBranch
    (order = declaration order in the pipeline config)."""
    students, teachers = [], []
    for branches in branch_lists:
        by_tag = {b['tag']: b for b in branches}
        students.append(by_tag['unsup_student']['img'])
        teachers.append(by_tag['unsup_teacher']['img'])
    return {
        'unsup_student_img': np.stack(students).astype(np.float32),
        'unsup_teacher_img': np.stack(teachers).astype(np.float32),
    }


class SemiLoader:
    """Iterator of train-step batch dicts.

    sup/unsup datasets are indexed by a SemiBalanceSampler; items run
    through their pipelines in a thread pool (PIL/numpy release the GIL for
    the heavy parts); finished batches wait in a bounded prefetch queue.
    """

    def __init__(self, sup_dataset, unsup_dataset=None,
                 sup_per_batch: int = 4, unsup_per_batch: int = 4,
                 num_workers: int = 8, prefetch: int = 2, seed: int = 0,
                 max_iter_size: Optional[int] = None):
        self.sup = sup_dataset
        self.unsup = unsup_dataset
        self.sampler = SemiBalanceSampler(
            len(sup_dataset),
            len(unsup_dataset) if unsup_dataset is not None else 0,
            sup_per_batch,
            unsup_per_batch if unsup_dataset is not None else 0,
            seed=seed, max_iter_size=max_iter_size)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        self._queue: 'queue.Queue' = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _make_batch(self, sup_idx, unsup_idx) -> Dict[str, np.ndarray]:
        sup_futs = [self.pool.submit(self.sup.__getitem__, i)
                    for i in sup_idx]
        unsup_futs = [self.pool.submit(self.unsup.__getitem__, i)
                      for i in unsup_idx] if self.unsup is not None else []
        batch = _stack_sup([f.result() for f in sup_futs])
        if unsup_futs:
            batch.update(_stack_unsup([f.result() for f in unsup_futs]))
        return batch

    def _producer(self):
        try:
            for sup_idx, unsup_idx in self.sampler:
                if self._stop.is_set():
                    return
                self._queue.put(self._make_batch(sup_idx, unsup_idx))
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
