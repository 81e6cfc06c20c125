"""Kill+resume robustness (reference utils/misc.py:7-41 + apis/train.py
auto-resume contract).

Two guarantees:
1. ``find_latest_checkpoint`` never offers an in-flight/aborted save —
   neither an ``iter_N.orbax-checkpoint-tmp`` staging dir nor a plain
   ``iter_N`` dir missing orbax's finalize marker (the exact artifact the
   round-3 fixture run left behind when the session died mid-save).
2. The resumed trajectory is bit-compatible: save at step k, restore into
   a fresh runner, feed the same remaining batches — the final params
   equal the uninterrupted run's exactly (per-step RNG is derived inside
   the jitted step from state.step + a constant base key, so a resumed
   run reproduces the same randomness stream at the same step).
"""
import os
import os.path as osp

import jax
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core import checkpoint as ckpt_lib
from s4former_tpu.core.runner import IterBasedRunner
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.train_step import create_train_state, \
    make_semi_train_step
from tests.test_semi.test_train_step import S4_CFG, TINY_MODEL, _batch


def _fresh_state():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    step = make_semi_train_step(model, S4_CFG, num_classes=5,
                                base_lr=0.01, max_iters=100)
    return state, step


def _loader(start=0):
    def gen():
        i = start
        while True:
            yield _batch(i)
            i += 1
    return gen()


def test_find_latest_skips_tmp_and_partial_dirs(tmp_path):
    wd = str(tmp_path)
    state, _ = _fresh_state()
    ckpt_lib.save_checkpoint(wd, 2, state)
    # aborted orbax staging dir (higher step — must NOT win)
    os.makedirs(osp.join(wd, 'iter_99.orbax-checkpoint-tmp'))
    # plain-named dir killed mid-write: no _CHECKPOINT_METADATA marker
    os.makedirs(osp.join(wd, 'iter_50'))
    with open(osp.join(wd, 'iter_50', '_METADATA'), 'w') as f:
        f.write('{}')
    latest = ckpt_lib.find_latest_checkpoint(wd)
    assert latest is not None and latest.endswith('iter_2'), latest


@pytest.mark.slow
def test_resume_trajectory_bit_compatible(tmp_path):
    wd_a = str(tmp_path / 'uninterrupted')
    wd_b = str(tmp_path / 'interrupted')

    # uninterrupted: 5 steps, batches 0..4
    state, step = _fresh_state()
    runner = IterBasedRunner(step, state, _loader(0), max_iters=5,
                             work_dir=wd_a, checkpoint_interval=2,
                             log_interval=100)
    final_a = runner.run()

    # interrupted: run to the iter_2 checkpoint, then "kill" — resume into
    # a FRESH runner/state and finish with the same remaining batches
    state, step = _fresh_state()
    runner = IterBasedRunner(step, state, _loader(0), max_iters=2,
                             work_dir=wd_b, checkpoint_interval=2,
                             log_interval=100)
    runner.run()
    # distractor artifacts a real kill leaves behind
    os.makedirs(osp.join(wd_b, 'iter_77.orbax-checkpoint-tmp'))

    state2, step2 = _fresh_state()
    runner2 = IterBasedRunner(step2, state2, _loader(2), max_iters=5,
                              work_dir=wd_b, checkpoint_interval=100,
                              log_interval=100)
    runner2.resume(auto=True)
    assert int(runner2.state.step) == 2
    final_b = runner2.run()

    for la, lb in zip(jax.tree_util.tree_leaves(final_a.params),
                      jax.tree_util.tree_leaves(final_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree_util.tree_leaves(final_a.ema_params),
                      jax.tree_util.tree_leaves(final_b.ema_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_async_save_finalize_roundtrip(tmp_path):
    """Round-5 async checkpointing (VERDICT r4 next #4): block=False
    returns immediately (state already copied off-device), the finalize
    barrier completes the write + meta + prune, and the checkpoint loads
    back bit-equal. A second async save implicitly finalizes the first."""
    wd = str(tmp_path)
    state, _ = _fresh_state()
    p1 = ckpt_lib.save_checkpoint(wd, 1, state, meta={'iter': 1},
                                  block=False)
    p2 = ckpt_lib.save_checkpoint(wd, 3, state, meta={'iter': 3},
                                  block=False)
    # save #2 must have finalized save #1 (at most one in flight)
    assert osp.exists(osp.join(p1, '_CHECKPOINT_METADATA'))
    assert osp.exists(osp.join(p1, 's4former_meta.json'))
    done = ckpt_lib.finalize_pending_saves()
    assert done == p2
    assert ckpt_lib.finalize_pending_saves() is None  # idempotent
    assert osp.exists(osp.join(p2, 's4former_meta.json'))
    latest = ckpt_lib.find_latest_checkpoint(wd)
    assert latest == p2
    restored = ckpt_lib.load_checkpoint(latest, state)
    for la, lb in zip(jax.tree_util.tree_leaves(state.params),
                      jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
