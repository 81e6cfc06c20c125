"""Evaluation metrics: IoU/Dice/Fscore from confusion histograms.

Rebuild of the reference metrics stack
(reference: mmseg/core/evaluation/metrics.py:26-342). The reference gathers
per-image histogram tuples across ranks via tmpdir files / gpu_collect
(apis/test.py:140+); here the per-image ``intersect_and_union`` is a pure
jnp histogram that can be accumulated on-device and summed with one
``lax.psum``/sharded ``jnp.sum`` — mIoU reduction is a single collective.

Both jnp (device, fixed-shape) and numpy (host, for dataset.evaluate parity)
entry points are provided.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def intersect_and_union(pred: Array, label: Array, num_classes: int,
                        ignore_index: int = 255
                        ) -> Tuple[Array, Array, Array, Array]:
    """Per-image histograms (metrics.py:26-83).

    pred, label: [H, W] (or any shape) int arrays.
    Returns (intersect, union, pred_area, label_area), each [num_classes].
    """
    mask = (label != ignore_index)
    pred = jnp.where(mask, pred, num_classes)  # overflow bucket
    label = jnp.where(mask, label, num_classes)

    def hist(x):
        oh = jax.nn.one_hot(x.reshape(-1), num_classes + 1,
                            dtype=jnp.float32)
        return jnp.sum(oh, axis=0)[:num_classes]

    inter = hist(jnp.where(pred == label, pred, num_classes))
    area_pred = hist(pred)
    area_label = hist(label)
    union = area_pred + area_label - inter
    return inter, union, area_pred, area_label


def total_intersect_and_union(preds, labels, num_classes: int,
                              ignore_index: int = 255):
    """Batched accumulation (metrics.py:89-130). preds/labels: [B, H, W]."""
    fn = jax.vmap(lambda p, l: intersect_and_union(
        p, l, num_classes, ignore_index))
    inter, union, ap, al = fn(preds, labels)
    return (jnp.sum(inter, 0), jnp.sum(union, 0),
            jnp.sum(ap, 0), jnp.sum(al, 0))


def _metrics_from_totals(total_inter: np.ndarray, total_union: np.ndarray,
                         total_pred: np.ndarray, total_label: np.ndarray,
                         metrics: Sequence[str] = ('mIoU',),
                         beta: float = 1.0,
                         nan_to_num: Optional[float] = None
                         ) -> Dict[str, np.ndarray]:
    """(metrics.py:256-342): per-class tables + aAcc."""
    allowed = {'mIoU', 'mDice', 'mFscore'}
    if not set(metrics).issubset(allowed):
        raise KeyError(f'metrics {metrics} not in {allowed}')
    out: Dict[str, np.ndarray] = {}
    with np.errstate(divide='ignore', invalid='ignore'):
        out['aAcc'] = np.array(total_inter.sum() /
                               max(total_label.sum(), 1e-12))
        acc = total_inter / total_label
        if 'mIoU' in metrics:
            out['IoU'] = total_inter / total_union
            out['Acc'] = acc
        if 'mDice' in metrics:
            out['Dice'] = 2 * total_inter / (total_pred + total_label)
            out['Acc'] = acc
        if 'mFscore' in metrics:
            precision = total_inter / total_pred
            recall = total_inter / total_label
            out['Fscore'] = ((1 + beta ** 2) * precision * recall /
                             (beta ** 2 * precision + recall))
            out['Precision'] = precision
            out['Recall'] = recall
    if nan_to_num is not None:
        out = {k: np.nan_to_num(v, nan=nan_to_num) for k, v in out.items()}
    return out


def eval_metrics(results, gt_seg_maps, num_classes: int,
                 ignore_index: int = 255,
                 metrics: Sequence[str] = ('mIoU',),
                 nan_to_num: Optional[float] = None,
                 beta: float = 1.0) -> Dict[str, np.ndarray]:
    """Host-side convenience over lists of per-image arrays
    (metrics.py:256-295)."""
    ti = np.zeros(num_classes)
    tu = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    tl = np.zeros(num_classes)
    for pred, label in zip(results, gt_seg_maps):
        i, u, p, l = intersect_and_union(
            jnp.asarray(pred), jnp.asarray(label), num_classes, ignore_index)
        ti += np.asarray(i)
        tu += np.asarray(u)
        tp += np.asarray(p)
        tl += np.asarray(l)
    return _metrics_from_totals(ti, tu, tp, tl, metrics, beta, nan_to_num)


def pre_eval_to_metrics(pre_eval_results,
                        metrics: Sequence[str] = ('mIoU',),
                        nan_to_num: Optional[float] = None,
                        beta: float = 1.0) -> Dict[str, np.ndarray]:
    """Streaming-eval aggregation (metrics.py:296-342): input is a list of
    (intersect, union, pred_area, label_area) tuples."""
    stacked = tuple(np.sum(np.stack([np.asarray(x[i]) for x in
                                     pre_eval_results]), axis=0)
                    for i in range(4))
    return _metrics_from_totals(*stacked, metrics=metrics, beta=beta,
                                nan_to_num=nan_to_num)


def mean_iou(results, gt_seg_maps, num_classes, ignore_index=255,
             nan_to_num=None):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ('mIoU',), nan_to_num)


def mean_dice(results, gt_seg_maps, num_classes, ignore_index=255,
              nan_to_num=None):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ('mDice',), nan_to_num)


def mean_fscore(results, gt_seg_maps, num_classes, ignore_index=255,
                nan_to_num=None, beta=1.0):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ('mFscore',), nan_to_num, beta)


def format_metrics_table(metrics: Dict[str, np.ndarray],
                         class_names: Sequence[str]) -> str:
    """Per-class table like the reference prints (custom.py:472-493)."""
    lines = ['per-class results:',
             f'{"Class":<20}' + ''.join(
                 f'{k:>10}' for k in metrics if k != 'aAcc')]
    per_class = {k: v for k, v in metrics.items() if k != 'aAcc'}
    for i, name in enumerate(class_names):
        row = f'{name:<20}'
        for v in per_class.values():
            row += f'{100 * float(v[i]):>10.2f}'
        lines.append(row)
    summary = ' | '.join(
        [f'aAcc {100 * float(metrics["aAcc"]):.2f}'] +
        [f'm{k} {100 * float(np.nanmean(v)):.2f}'
         for k, v in per_class.items()])
    lines.append(summary)
    return '\n'.join(lines)
