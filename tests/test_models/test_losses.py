"""Loss parity/behavior tests. torch CE is the oracle for the reduction
semantics (reference cross_entropy_loss.py:44-61)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s4former_tpu.models.losses.cross_entropy import (accuracy,
                                                      cross_entropy_loss)
from s4former_tpu.models.losses.extra_losses import (DiceLoss, FocalLoss,
                                                     LovaszLoss,
                                                     OHEM_CrossEntropyLoss)
from s4former_tpu.registry import LOSSES


def _case(seed=0, b=2, h=8, w=8, c=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, c).astype(np.float32)
    label = rng.randint(0, c, (b, h, w)).astype(np.int64)
    label[0, :2] = 255
    return logits, label


def test_ce_default_averages_over_all_pixels():
    """avg_non_ignore=False: mean over ALL pixels (ignored contribute 0 to
    the numerator, count in the denominator)."""
    logits, label = _case()
    ours = float(cross_entropy_loss(jnp.asarray(logits),
                                    jnp.asarray(label.astype(np.int32))))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref_none = F.cross_entropy(lt, torch.from_numpy(label),
                               ignore_index=255, reduction='none')
    ref = float(ref_none.mean())  # mmcv weight_reduce_loss default
    assert abs(ours - ref) < 1e-5


def test_ce_avg_non_ignore_matches_torch_mean():
    logits, label = _case()
    ours = float(cross_entropy_loss(jnp.asarray(logits),
                                    jnp.asarray(label.astype(np.int32)),
                                    avg_non_ignore=True))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref = float(F.cross_entropy(lt, torch.from_numpy(label),
                                ignore_index=255))
    assert abs(ours - ref) < 1e-5


def test_class_weight():
    logits, label = _case()
    cw = np.linspace(0.5, 1.5, 5).tolist()
    ours = float(cross_entropy_loss(jnp.asarray(logits),
                                    jnp.asarray(label.astype(np.int32)),
                                    class_weight=cw))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref_none = F.cross_entropy(lt, torch.from_numpy(label),
                               weight=torch.tensor(cw), ignore_index=255,
                               reduction='none')
    ref = float(ref_none.mean())
    assert abs(ours - ref) < 1e-5


def test_accuracy():
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[..., 1] = 5.0
    label = np.array([[[1, 1], [0, 255]]], np.int32)
    acc = float(accuracy(jnp.asarray(logits), jnp.asarray(label)))
    assert abs(acc - 100 * 2 / 3) < 1e-4


@pytest.mark.parametrize('loss_cfg', [
    dict(type='OHEM_CrossEntropyLoss', thres=0.7, min_kept=10),
    dict(type='DiceLoss'),
    dict(type='FocalLoss'),
    dict(type='LovaszLoss', per_image=True),
])
def test_extra_losses_finite_and_positive(loss_cfg):
    logits, label = _case(1)
    loss = LOSSES.build(loss_cfg)
    v = float(loss(jnp.asarray(logits), jnp.asarray(label.astype(np.int32))))
    assert np.isfinite(v) and v >= 0


def test_ohem_keeps_hardest():
    """With min_kept=1 and a huge threshold margin, only hard pixels
    contribute."""
    logits = np.zeros((1, 2, 2, 2), np.float32)
    logits[0, 0, 0] = [10.0, -10.0]   # easy pixel, target 0
    logits[0, 0, 1] = [-10.0, 10.0]   # hard pixel, target 0
    label = np.zeros((1, 2, 2), np.int64)
    label[0, 1] = 255                  # two ignored
    loss = OHEM_CrossEntropyLoss(thres=0.5, min_kept=1)
    v = float(loss(jnp.asarray(logits), jnp.asarray(label.astype(np.int32))))
    # only the hard pixel (CE=20ish) should be kept, averaged over kept=1
    assert v > 5.0


def test_lovasz_perfect_prediction_near_zero():
    label = np.zeros((1, 4, 4), np.int32)
    logits = np.full((1, 4, 4, 3), -10.0, np.float32)
    logits[..., 0] = 10.0
    loss = LovaszLoss(per_image=True)
    assert float(loss(jnp.asarray(logits), jnp.asarray(label))) < 1e-3


def test_edge_loss_upweights_boundaries():
    from s4former_tpu.models.losses.extra_losses import EdgeLoss
    logits, label = _case(2)
    v = float(EdgeLoss()(jnp.asarray(logits),
                         jnp.asarray(label.astype(np.int32))))
    assert np.isfinite(v) and v > 0
    # uniform label -> no edges -> equals plain weighted CE mean over valid
    flat_label = np.zeros((1, 8, 8), np.int32)
    v2 = float(EdgeLoss(edge_weight=100.0)(
        jnp.asarray(logits[:1]), jnp.asarray(flat_label)))
    v3 = float(EdgeLoss(edge_weight=0.0)(
        jnp.asarray(logits[:1]), jnp.asarray(flat_label)))
    assert abs(v2 - v3) < 1e-6  # no boundary pixels -> weight irrelevant
