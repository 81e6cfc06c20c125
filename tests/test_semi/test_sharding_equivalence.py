"""Single-device vs 8-device numerical equivalence of the jitted step.

SURVEY §2.8's point: under GSPMD the sharded program must compute the
SAME numbers as the unsharded one on the same global batch — gradient
means (the reference's DDP all-reduce), cross-replica BatchNorm moments
(SyncBN), and scalar log means (_parse_losses all_reduce,
reference base.py:259-276) all become XLA collectives whose math is
identical to the single-device reduction, up to float reassociation.

Round-2 tests proved the sharded step *runs*; this one pins that it
*computes the same numbers*: same TrainState, same global batch, same
PRNG key -> allclose logs and allclose updated params/EMA/batch_stats.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.parallel.mesh import (make_mesh, replicate_state,
                                        shard_batch)
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)
from tests.test_semi.test_train_step import S4_CFG, TINY_MODEL


def _batch(rng=0, b=8, hw=64):
    r = np.random.RandomState(rng)
    return {
        'sup_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
        'sup_gt': jnp.asarray(r.randint(0, 5, (b, hw, hw)), jnp.int32),
        'unsup_teacher_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
        'unsup_student_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
    }


def _tree_allclose(a, b, rtol, atol, label):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=f'{label}: {jax.tree_util.keystr(path)}')


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_step_matches_unsharded_numbers():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    step = jax.jit(make_semi_train_step(model, S4_CFG, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    batch = _batch()
    key = jax.random.PRNGKey(42)

    # unsharded: default placement (everything on device 0)
    new_un, logs_un = step(state, batch, key)

    # sharded: batch axis over the 8-device 'data' mesh, state replicated
    mesh = make_mesh()
    new_sh, logs_sh = step(replicate_state(mesh, state),
                           shard_batch(mesh, batch),
                           jax.device_put(key))

    for k in logs_un:
        np.testing.assert_allclose(
            np.asarray(logs_un[k]), np.asarray(logs_sh[k]),
            rtol=2e-4, atol=1e-5, err_msg=f'log {k}')
    _tree_allclose(new_un.params, new_sh.params, 1e-4, 1e-5, 'params')
    _tree_allclose(new_un.ema_params, new_sh.ema_params, 1e-4, 1e-5,
                   'ema_params')
    _tree_allclose(new_un.batch_stats, new_sh.batch_stats, 1e-4, 1e-5,
                   'batch_stats')
    _tree_allclose(new_un.momentum, new_sh.momentum, 1e-4, 1e-5,
                   'sgd momentum')


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_multi_step_trajectory_matches():
    """Three chained steps: sharded and unsharded trajectories stay
    together (catches drift through batch_stats / EMA / SGD buffers)."""
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    step = jax.jit(make_semi_train_step(model, S4_CFG, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    key = jax.random.PRNGKey(7)

    mesh = make_mesh()
    s_un = state
    s_sh = replicate_state(mesh, state)
    for i in range(3):
        batch = _batch(i)
        s_un, logs_un = step(s_un, batch, key)
        s_sh, logs_sh = step(s_sh, shard_batch(mesh, batch),
                             jax.device_put(key))
    np.testing.assert_allclose(float(logs_un['loss']),
                               float(logs_sh['loss']), rtol=5e-4)
    _tree_allclose(s_un.params, s_sh.params, 5e-4, 5e-5, 'params@3')
    _tree_allclose(s_un.ema_params, s_sh.ema_params, 5e-4, 5e-5, 'ema@3')
