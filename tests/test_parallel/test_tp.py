"""Tensor-parallel (Megatron-sharding) numerical equivalence.

The reference has no model parallelism (DDP only; tools/dist_train.sh);
``parallel/tp.py`` is capability beyond parity. The contract mirrors
test_sharding_equivalence.py's: GSPMD shardings must never change the
math — a (data=4, model=2) mesh with column/row-split transformer blocks
computes the SAME step as the unsharded program, up to reassociation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.parallel.mesh import make_mesh, shard_batch
from s4former_tpu.parallel.tp import (shard_train_state, tp_out_shardings,
                                      tp_param_specs)
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)
from tests.test_semi.test_sharding_equivalence import _batch, _tree_allclose
from tests.test_semi.test_train_step import S4_CFG, TINY_MODEL

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 devices')


def _flagship_like_state():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    return model, create_train_state(variables, ema=True)


def test_tp_specs_hit_attention_and_ffn():
    _, state = _flagship_like_state()
    mesh = make_mesh(8, model_parallel=2)
    specs = tp_param_specs(state.params, mesh)
    blk = specs['backbone_m']['layers']['block']
    # stacked-scan kernels are [L, in, out]
    assert blk['attn']['qkv']['kernel'] == P(None, None, 'model')
    assert blk['attn']['qkv']['bias'] == P(None, 'model')
    assert blk['attn']['proj']['kernel'] == P(None, 'model', None)
    assert blk['attn']['proj']['bias'] == P()          # row-split bias
    assert blk['ffn']['fc1']['kernel'] == P(None, None, 'model')
    assert blk['ffn']['fc2']['kernel'] == P(None, 'model', None)
    assert blk['ln1']['scale'] == P()
    assert specs['decode_head_m']['conv_seg']['kernel'] == P()
    # model axis 1 -> pure DP, all replicated
    specs_dp = tp_param_specs(state.params, make_mesh(8, model_parallel=1))
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs_dp, is_leaf=lambda x: isinstance(x, P)))


def test_tp_step_matches_unsharded():
    model, state = _flagship_like_state()
    step = make_semi_train_step(model, S4_CFG, num_classes=5,
                                base_lr=0.01, max_iters=100)
    batch = _batch()
    key = jax.random.PRNGKey(42)

    new_un, logs_un = jax.jit(step)(state, batch, key)

    mesh = make_mesh(8, model_parallel=2)   # data=4 x model=2
    state_tp = shard_train_state(mesh, state)
    jit_tp = jax.jit(step, out_shardings=(tp_out_shardings(mesh, state),
                                          None))
    with mesh:
        new_tp, logs_tp = jit_tp(state_tp, shard_batch(mesh, batch),
                                 jax.device_put(key))

    for k in logs_un:
        np.testing.assert_allclose(
            np.asarray(logs_un[k]), np.asarray(logs_tp[k]),
            rtol=2e-4, atol=1e-5, err_msg=f'log {k}')
    _tree_allclose(new_un.params, new_tp.params, 1e-4, 1e-5, 'params')
    _tree_allclose(new_un.ema_params, new_tp.ema_params, 1e-4, 1e-5, 'ema')
    _tree_allclose(new_un.batch_stats, new_tp.batch_stats, 1e-4, 1e-5,
                   'batch_stats')
    _tree_allclose(new_un.momentum, new_tp.momentum, 1e-4, 1e-5, 'momentum')
    # the updated params actually KEPT the TP layout (no silent gather-back)
    qkv = new_tp.params['backbone_m']['layers']['block']['attn']['qkv'][
        'kernel']
    assert qkv.sharding.spec == P(None, None, 'model')


def test_zero3_specs_shard_over_data():
    _, state = _flagship_like_state()
    mesh = make_mesh(8, model_parallel=2)
    specs = tp_param_specs(state.params, mesh, zero3=True)
    blk = specs['backbone_m']['layers']['block']
    # col kernels: in-dim over 'data' (ZeRO), out-dim over 'model' (TP)
    assert blk['attn']['qkv']['kernel'] == P(None, 'data', 'model')
    assert blk['ffn']['fc1']['kernel'] == P(None, 'data', 'model')
    # row kernels: in-dim 'model', out-dim 'data'
    assert blk['attn']['proj']['kernel'] == P(None, 'model', 'data')
    assert blk['ffn']['fc2']['kernel'] == P(None, 'model', 'data')
    # biases keep their pure-TP layout
    assert blk['attn']['qkv']['bias'] == P(None, 'model')
    assert blk['attn']['proj']['bias'] == P()


def test_zero3_step_matches_unsharded():
    """DP=4 x TP=2 with ZeRO-3 weight sharding == the unsharded step."""
    model, state = _flagship_like_state()
    step = make_semi_train_step(model, S4_CFG, num_classes=5,
                                base_lr=0.01, max_iters=100)
    batch = _batch()
    key = jax.random.PRNGKey(42)
    new_un, logs_un = jax.jit(step)(state, batch, key)

    mesh = make_mesh(8, model_parallel=2)
    state_z = shard_train_state(mesh, state, zero3=True)
    jit_z = jax.jit(step, out_shardings=(
        tp_out_shardings(mesh, state, zero3=True), None))
    with mesh:
        new_z, logs_z = jit_z(state_z, shard_batch(mesh, batch),
                              jax.device_put(key))
    np.testing.assert_allclose(float(logs_un['loss']),
                               float(logs_z['loss']), rtol=2e-4)
    _tree_allclose(new_un.params, new_z.params, 1e-4, 1e-5, 'params')
    _tree_allclose(new_un.momentum, new_z.momentum, 1e-4, 1e-5, 'momentum')
    qkv = new_z.params['backbone_m']['layers']['block']['attn']['qkv'][
        'kernel']
    assert qkv.sharding.spec == P(None, 'data', 'model')


def test_tp_trajectory_stays_sharded():
    """3 chained steps under TP: trajectory matches DP-unsharded and the
    weights never lose their 'model' sharding between steps."""
    model, state = _flagship_like_state()
    step = make_semi_train_step(model, S4_CFG, num_classes=5,
                                base_lr=0.01, max_iters=100)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(8, model_parallel=2)
    s_un = state
    s_tp = shard_train_state(mesh, state)
    jit_tp = jax.jit(step, out_shardings=(tp_out_shardings(mesh, state),
                                          None))
    for i in range(3):
        batch = _batch(i)
        s_un, _ = jax.jit(step)(s_un, batch, key)
        with mesh:
            s_tp, _ = jit_tp(s_tp, shard_batch(mesh, batch),
                             jax.device_put(key))
    _tree_allclose(s_un.params, s_tp.params, 5e-4, 5e-5, 'params@3')
    fc1 = s_tp.params['backbone_m']['layers']['block']['ffn']['fc1']['kernel']
    assert fc1.sharding.spec == P(None, None, 'model')
