"""Iteration-based training runner.

Rebuild of mmcv ``IterBasedRunner`` + hook stack as used by the reference
(reference: mmseg/apis/train.py:70-269): poly-LR + optimizer live inside
the jitted step; the runner handles the host-side loop — data feed,
periodic text logging (TextLoggerHook, default_runtime.py:85-92), periodic
mIoU eval (EvalHook, core/evaluation/eval_hooks.py:14-64), checkpointing
(CheckpointHook) and auto-resume.
"""
from __future__ import annotations

import logging
import os.path as osp
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s4former_tpu.core import checkpoint as ckpt_lib
from s4former_tpu.core.metrics import pre_eval_to_metrics
from s4former_tpu.utils.logger import get_root_logger


class IterBasedRunner:
    def __init__(self,
                 train_step: Callable,
                 state,
                 loader: Iterable,
                 max_iters: int,
                 work_dir: str,
                 mesh=None,
                 log_interval: int = 50,
                 checkpoint_interval: int = 5750,
                 eval_interval: int = 1150,
                 eval_fn: Optional[Callable] = None,
                 seed: int = 0,
                 logger: Optional[logging.Logger] = None):
        # donate the state: params/momentum/EMA trees update in place on
        # device instead of allocating fresh buffers每 step
        self.train_step = jax.jit(train_step, donate_argnums=0)
        self.state = state
        self.loader = loader
        self.max_iters = max_iters
        self.work_dir = work_dir
        self.mesh = mesh
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.eval_interval = eval_interval
        self.eval_fn = eval_fn
        self.rng = jax.random.PRNGKey(seed)
        self.logger = logger or get_root_logger()
        self.best_miou = -1.0

    def resume(self, path: Optional[str] = None, auto: bool = False):
        if path is None and auto:
            path = ckpt_lib.find_latest_checkpoint(self.work_dir)
        if path:
            self.state = ckpt_lib.load_checkpoint(path, self.state)
            self.logger.info(f'resumed from {path} '
                             f'(iter {int(self.state.step)})')

    def run(self):
        from s4former_tpu.parallel.mesh import shard_batch
        start = int(self.state.step)
        it = start
        t_window = time.perf_counter()
        data_iter = iter(self.loader)
        ctx = self.mesh if self.mesh is not None else _NullCtx()
        with ctx:
            while it < self.max_iters:
                batch = next(data_iter)
                if self.mesh is not None:
                    batch = shard_batch(self.mesh, batch)
                step_rng = jax.random.fold_in(self.rng, it)
                self.state, logs = self.train_step(self.state, batch,
                                                   step_rng)
                it += 1
                if it % self.log_interval == 0:
                    jax.block_until_ready(logs['loss'])
                    dt = time.perf_counter() - t_window
                    t_window = time.perf_counter()
                    msg = ', '.join(
                        f'{k}: {float(v):.4f}' for k, v in sorted(
                            logs.items()))
                    self.logger.info(
                        f'Iter [{it}/{self.max_iters}] '
                        f'{self.log_interval / dt:.2f} it/s, {msg}')
                    if float(logs.get('mask_ratio', 1.0)) == 0.0 and \
                            it <= 5 * self.log_interval:
                        self.logger.info(
                            'note: mask_ratio=0 — no teacher pixel above '
                            'the confidence threshold yet, so unsup losses '
                            'are 0; expected early in training / from '
                            'random init')
                if self.eval_fn is not None and it % self.eval_interval == 0:
                    self._evaluate(it)
                if it % self.checkpoint_interval == 0:
                    self._checkpoint(it)
        if it % self.checkpoint_interval != 0:  # avoid double final save
            self._checkpoint(it)
        return self.state

    def _evaluate(self, it: int):
        t0 = time.perf_counter()
        metrics = self.eval_fn(self.state)
        miou = float(metrics.get('mIoU', np.nan))
        self.logger.info(
            f'Eval @ iter {it}: ' +
            ', '.join(f'{k}: {v:.4f}' for k, v in metrics.items()
                      if not k.startswith(('IoU.', 'Acc.'))) +
            f' ({time.perf_counter() - t0:.1f}s)')
        if miou > self.best_miou:
            self.best_miou = miou
            ckpt_lib.save_checkpoint(
                osp.join(self.work_dir, 'best'), it, self.state, keep=1,
                meta={'mIoU': miou, 'iter': it})

    def _checkpoint(self, it: int):
        path = ckpt_lib.save_checkpoint(self.work_dir, it, self.state,
                                        meta={'iter': it})
        self.logger.info(f'saved checkpoint {path}')


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def make_eval_fn(model, dataset, batch_size: int = 1,
                 mode: str = 'whole', crop_size=(512, 512),
                 stride=(341, 341), mesh=None):
    """Build an eval closure: state -> metrics dict.

    Streams the val set through whole/slide inference, accumulating
    per-image confusion histograms (the reference's pre_eval path,
    custom.py:302 + eval_hooks.py) — final reduction is one numpy sum.
    """
    from s4former_tpu.models.segmentors.inference import inference

    n_cls = len(dataset.CLASSES)

    @jax.jit
    def _predict(variables, img):
        probs = inference(
            lambda x: model.apply(variables, x, train=False),
            img, n_cls, mode=mode, crop_size=crop_size, stride=stride)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    def eval_fn(state):
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}

        def predict(img):
            return _predict(variables, img)

        pre_eval_results = []
        for idx in range(len(dataset)):
            item = dataset.get_item_deterministic(idx, seed=0)
            if isinstance(item, list):  # MultiScaleFlipAug single scale
                item = item[0]
            img = np.asarray(item['img'], np.float32)[None]
            pred = np.asarray(predict(img))[0]
            # resize pred to gt shape if pipeline rescaled
            gt = dataset.get_gt_seg_map(idx)
            if pred.shape != gt.shape:
                from PIL import Image
                pred = np.asarray(Image.fromarray(
                    pred.astype(np.uint8)).resize(
                        (gt.shape[1], gt.shape[0]), Image.NEAREST))
            pre_eval_results.extend(dataset.pre_eval([pred], [idx]))
        tables = pre_eval_to_metrics(pre_eval_results, ('mIoU',))
        return {'aAcc': float(tables['aAcc']),
                'mIoU': float(np.nanmean(tables['IoU'])),
                'mAcc': float(np.nanmean(tables['Acc']))}

    return eval_fn
