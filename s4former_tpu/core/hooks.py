"""Observability: metric logging hooks + on-demand profiler.

Rebuilds of the reference's logging/tracing subsystems (SURVEY.md §5):
- ``TextLoggerHook`` (mmcv, default_runtime.py:85-92) — handled by the
  runner's formatted log lines.
- ``MMSegWandbHook`` (reference: mmseg/core/hook/wandblogger_hook.py:15) —
  the W&B dependency is not in this image, so the same contract
  (scalar metrics per step + eval tables + checkpoint artifacts) is served
  by ``JsonlLoggerHook`` writing work_dir/metrics.jsonl; if a ``wandb``
  package is importable it is used transparently.
- Profiling: the reference has none integrated (only offline
  tools/benchmark.py); here ``profile_steps`` captures a real
  ``jax.profiler`` device trace around N training steps.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict, Optional


class JsonlLoggerHook:
    """Append one JSON object per logging event to metrics.jsonl."""

    def __init__(self, work_dir: str, filename: str = 'metrics.jsonl'):
        os.makedirs(work_dir, exist_ok=True)
        self.path = osp.join(work_dir, filename)
        self._wandb = None
        try:
            import wandb  # optional, absent in this image
            if wandb.run is not None:
                self._wandb = wandb
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float],
            prefix: str = 'train'):
        record = {'step': int(step), 'time': time.time(),
                  'prefix': prefix}
        record.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, 'a') as f:
            f.write(json.dumps(record) + '\n')
        if self._wandb is not None:
            self._wandb.log({f'{prefix}/{k}': v for k, v in
                             metrics.items()}, step=step)

    def log_eval_images(self, step: int, images, preds, gts,
                        palette=None, max_images: int = 8):
        """Validation image table (reference MMSegWandbHook val-table
        logging, wandblogger_hook.py:199-317): side-by-side
        image | GT overlay | prediction overlay per sample. Written as
        PNGs under work_dir/eval_vis/iter_N/ and, when a wandb run is
        live, as a wandb.Table of masked images."""
        import numpy as np
        from s4former_tpu.utils.palette import paint_result
        out_dir = osp.join(osp.dirname(self.path), 'eval_vis',
                           f'iter_{int(step)}')
        os.makedirs(out_dir, exist_ok=True)
        if palette is None:
            n = 256
            rng = np.random.RandomState(42)
            palette = rng.randint(0, 255, (n, 3)).tolist()
        rows = []
        for i, (img, pred, gt) in enumerate(zip(images, preds, gts)):
            if i >= max_images:
                break
            img = np.asarray(img)
            if img.dtype != np.uint8:
                lo, hi = float(img.min()), float(img.max())
                img = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(
                    np.uint8)
            pred = np.asarray(pred)
            if img.shape[:2] != pred.shape[:2]:
                # the captured input is the eval-pipeline scale; pred/gt
                # are ori_shape — bring the image to ori_shape for display
                from s4former_tpu.data.pipelines.transforms import \
                    _pil_resize
                img = _pil_resize(
                    img, (pred.shape[1], pred.shape[0]))
            pred_vis = paint_result(img, np.where(
                np.asarray(pred) == 255, 0, np.asarray(pred)), palette)
            gt_vis = paint_result(img, np.where(
                np.asarray(gt) == 255, 0, np.asarray(gt)), palette)
            panel = np.concatenate([img, gt_vis, pred_vis], axis=1)
            from PIL import Image
            path = osp.join(out_dir, f'{i:03d}.png')
            Image.fromarray(panel).save(path)
            rows.append((path, pred, gt))
        if self._wandb is not None and rows:
            wandb = self._wandb
            table = wandb.Table(columns=['image', 'ground_truth',
                                         'prediction'])
            for path, pred, gt in rows:
                masks_gt = {'ground_truth': {'mask_data': np.asarray(gt)}}
                masks_pr = {'prediction': {'mask_data': np.asarray(pred)}}
                table.add_data(wandb.Image(path),
                               wandb.Image(path, masks=masks_gt),
                               wandb.Image(path, masks=masks_pr))
            wandb.log({'val/examples': table}, step=int(step))
        return out_dir


def profile_steps(step_fn, state, batch, rng, out_dir: str,
                  num_steps: int = 3):
    """Capture a jax.profiler trace of ``num_steps`` train steps.

    View with tensorboard/xprof. Returns the final state.
    """
    import jax
    import jax.numpy as jnp
    os.makedirs(out_dir, exist_ok=True)

    def sync(st):
        # block_until_ready does not wait on this runtime (CLAUDE.md);
        # pull a dependent scalar to host instead
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    # warmup/compile outside the trace
    state, _ = step_fn(state, batch, rng)
    sync(state)
    with jax.profiler.trace(out_dir):
        for i in range(num_steps):
            state, logs = step_fn(state, batch, jax.random.fold_in(rng, i))
        sync(state)
    return state
