"""EMA update-scope parity vs the reference's four per-module calls.

The reference updates each module with its OWN momentum
(encoder_decoder.py:416-423):
    update_ema_variables(backbone,  backbone_ema,  momentum_backbone)
    update_ema_variables(neck,      neck_ema,      momentum)          # plain
    update_ema_variables(decode_head, decode_head_ema, momentum_head,
                         momentum_head_dropout)
    update_ema_variables(auxiliary_head, aux_ema,  momentum)          # plain
and inside each call lerps params and BN buffers with that same momentum
(:1044-1066); dropout applies to the *parameter* loop only (:1050-1053).

Oracle below is a literal torch port of update_ema_variables run once per
module with distinct momenta, asserting our single scoped tree-lerp
produces identical numbers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from s4former_tpu.semi.ema import ema_update_scoped

M_BACKBONE, M_PLAIN, M_HEAD = 0.9, 0.5, 0.1


def _torch_update_ema(params, ema, momentum, dropout=0.0):
    """Literal port of update_ema_variables' parameter loop (:1048-1060).

    dropout=0 in the oracle: torch's random.random() stream cannot be
    reproduced in JAX; the dropout *scope* is asserted separately.
    """
    out = {}
    for name in params:
        src = torch.from_numpy(params[name])
        tgt = torch.from_numpy(ema[name]).clone()
        tgt.mul_(momentum).add_(src, alpha=1 - momentum)
        out[name] = tgt.numpy()
    return out


def _rand_tree(rng, names):
    return {n: rng.randn(3, 4).astype(np.float32) for n in names}


def _make_module_trees(rng):
    student, teacher = {}, {}
    for mod in ('backbone_m', 'decode_head_m', 'neck_m', 'aux_heads'):
        student[mod] = _rand_tree(rng, ('w', 'b'))
        teacher[mod] = _rand_tree(rng, ('w', 'b'))
    return student, teacher


def test_ema_scope_matches_per_module_torch_calls():
    rng = np.random.RandomState(0)
    student, teacher = _make_module_trees(rng)

    # oracle: four separate torch calls, as the reference does
    expect = {
        'backbone_m': _torch_update_ema(
            student['backbone_m'], teacher['backbone_m'], M_BACKBONE),
        'neck_m': _torch_update_ema(
            student['neck_m'], teacher['neck_m'], M_PLAIN),
        'decode_head_m': _torch_update_ema(
            student['decode_head_m'], teacher['decode_head_m'], M_HEAD),
        'aux_heads': _torch_update_ema(
            student['aux_heads'], teacher['aux_heads'], M_PLAIN),
    }

    got = ema_update_scoped(
        jax.tree_util.tree_map(jnp.asarray, teacher),
        jax.tree_util.tree_map(jnp.asarray, student),
        momentum_backbone=M_BACKBONE, momentum_head=M_HEAD,
        momentum_plain=M_PLAIN)

    for mod in expect:
        for name in expect[mod]:
            np.testing.assert_allclose(
                np.asarray(got[mod][name]), expect[mod][name],
                rtol=1e-6, atol=1e-6, err_msg=f'{mod}/{name}')


def test_ema_scope_batch_stats_use_module_momentum():
    """BN buffers lerp inside the same per-module call (:1062-1066), so
    backbone stats use momentum_backbone, decode_head stats momentum_head,
    aux/neck stats the plain momentum — and never the dropout."""
    rng = np.random.RandomState(1)
    student, teacher = _make_module_trees(rng)
    got = ema_update_scoped(
        jax.tree_util.tree_map(jnp.asarray, teacher),
        jax.tree_util.tree_map(jnp.asarray, student),
        momentum_backbone=M_BACKBONE, momentum_head=M_HEAD,
        momentum_plain=M_PLAIN,
        dropout_head=0.9, key=jax.random.PRNGKey(0),  # must be ignored
        is_params=False)
    for mod, m in (('backbone_m', M_BACKBONE), ('decode_head_m', M_HEAD),
                   ('neck_m', M_PLAIN), ('aux_heads', M_PLAIN)):
        for name in student[mod]:
            expect = teacher[mod][name] * m + student[mod][name] * (1 - m)
            np.testing.assert_allclose(np.asarray(got[mod][name]), expect,
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f'{mod}/{name}')


def test_ema_head_dropout_scope_is_decode_head_params_only():
    """momentum_head_dropout skips decode_head params with prob p
    (:1050-1053). With p=1 every decode_head param must stay at the
    teacher value while backbone/neck/aux still lerp normally."""
    rng = np.random.RandomState(2)
    student, teacher = _make_module_trees(rng)
    got = ema_update_scoped(
        jax.tree_util.tree_map(jnp.asarray, teacher),
        jax.tree_util.tree_map(jnp.asarray, student),
        momentum_backbone=M_BACKBONE, momentum_head=M_HEAD,
        momentum_plain=M_PLAIN,
        dropout_head=1.0, key=jax.random.PRNGKey(3), is_params=True)
    for name in teacher['decode_head_m']:
        np.testing.assert_allclose(np.asarray(got['decode_head_m'][name]),
                                   teacher['decode_head_m'][name])
    for mod, m in (('backbone_m', M_BACKBONE), ('neck_m', M_PLAIN),
                   ('aux_heads', M_PLAIN)):
        for name in teacher[mod]:
            expect = teacher[mod][name] * m + student[mod][name] * (1 - m)
            np.testing.assert_allclose(np.asarray(got[mod][name]), expect,
                                       rtol=1e-6, atol=1e-6)
