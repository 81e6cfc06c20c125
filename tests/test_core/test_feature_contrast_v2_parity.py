"""FeatureContrastV2 parity vs a literal torch port of the reference.

Oracle: mmseg/models/decode_heads/feature_contrast_v2.py — the memory
update `add_features_from_sample_learned` (active mean-append/FIFO path,
:118-134) and `forward` (:136-191) including the negative branch's
loop-variable clobber (the inner `for n_c in range(self.n_classes)`
reuses the outer counter, so the final division is by n_classes-1).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s4former_tpu.models.decode_heads.projection import (
    add_mean_features_v2, feature_contrast_loss_v2)

import jax.numpy as jnp


class TorchFeatureContrastV2:
    """Literal port of the reference class (state + the two methods)."""

    def __init__(self, num_classes, memory_per_class, feature_size,
                 n_classes, negative=False):
        self.num_classes = num_classes
        self.memory_per_class = memory_per_class
        self.feature_size = feature_size
        self.n_classes = n_classes
        self.negative = negative
        self.memory_saved = torch.zeros(num_classes).long()
        self.memory_bank = torch.zeros(
            num_classes, memory_per_class, feature_size)

    def add_features_from_sample_learned(self, features, class_labels):
        features = features.detach()
        class_labels = class_labels.detach()
        for c in range(self.n_classes):
            mask_c = class_labels == c
            features_c = features[mask_c, :]
            features_c = F.normalize(features_c, dim=1)
            if features_c.shape[0] > 0:
                mean_features_c = torch.mean(features_c, 0)
                if self.memory_saved[c] + 1 > self.memory_per_class:
                    self.memory_bank[c] = torch.cat(
                        (self.memory_bank[c, 1:],
                         mean_features_c.unsqueeze(0)), dim=0)
                    self.memory_saved[c] = self.memory_per_class
                else:
                    self.memory_bank[
                        c, self.memory_saved[c]:self.memory_saved[c] + 1] \
                        = mean_features_c
                    self.memory_saved[c] += 1

    def forward(self, features, class_labels):
        loss = 0
        n_c = 0
        for c in range(self.n_classes):
            mask_c = class_labels == c
            features_c = features[mask_c, :]
            memory_saved_c = self.memory_saved[c]
            memory_c = self.memory_bank[c, :memory_saved_c]
            if memory_saved_c > 1 and features_c.shape[0] > 1:
                memory_c = F.normalize(memory_c, dim=1)
                features_c_norm = F.normalize(features_c, dim=1)
                similarities = torch.mm(
                    features_c_norm, memory_c.transpose(1, 0))
                distances = 1 - similarities
                loss = loss + distances.mean()
                n_c += 1
                if self.negative:
                    n_c_cnt = 0
                    distances_nc_all = 0
                    for n_c in range(self.n_classes):  # noqa: B007 clobber
                        if n_c == c:
                            continue
                        if self.memory_saved[n_c] > 0:
                            memory_nc = self.memory_bank[
                                n_c, :self.memory_saved[n_c]]
                            similarities_nc = torch.mm(
                                features_c_norm, memory_nc.transpose(1, 0))
                            distances_nc = 1 + similarities_nc
                            distances_nc_all = (distances_nc_all
                                                + distances_nc.mean())
                            n_c_cnt += 1
                    if n_c_cnt > 0:
                        loss = loss + distances_nc_all / n_c_cnt
        if self.negative:
            return loss / n_c
        return loss / self.num_classes


def _random_round(rng, p, c_hot, d):
    """Features [P, D] and labels biased so some classes get 0/1/many."""
    feats = rng.randn(p, d).astype(np.float32)
    labels = rng.randint(0, c_hot, size=(p,)).astype(np.int64)
    return feats, labels


@pytest.mark.parametrize('n_classes,num_classes', [(6, 6), (4, 6)])
def test_memory_update_parity(n_classes, num_classes):
    rng = np.random.RandomState(0)
    mpc, d = 3, 8
    oracle = TorchFeatureContrastV2(num_classes, mpc, d, n_classes)
    bank = jnp.zeros((num_classes, mpc, d), jnp.float32)
    count = jnp.zeros((num_classes,), jnp.int32)
    # 6 rounds: appends first, FIFO-shift once counts hit mpc=3
    for _ in range(6):
        feats, labels = _random_round(rng, 24, n_classes + 1, d)
        oracle.add_features_from_sample_learned(
            torch.from_numpy(feats), torch.from_numpy(labels))
        bank, count = add_mean_features_v2(
            bank, count, jnp.asarray(feats), jnp.asarray(labels),
            n_classes=n_classes)
    np.testing.assert_array_equal(
        np.asarray(count), oracle.memory_saved.numpy())
    np.testing.assert_allclose(
        np.asarray(bank), oracle.memory_bank.numpy(), atol=1e-6)


@pytest.mark.parametrize('negative', [False, True])
@pytest.mark.parametrize('n_classes,num_classes', [(6, 6), (4, 6)])
def test_forward_parity(negative, n_classes, num_classes):
    rng = np.random.RandomState(1)
    mpc, d = 3, 8
    oracle = TorchFeatureContrastV2(
        num_classes, mpc, d, n_classes, negative=negative)
    bank = jnp.zeros((num_classes, mpc, d), jnp.float32)
    count = jnp.zeros((num_classes,), jnp.int32)
    for _ in range(4):
        feats, labels = _random_round(rng, 24, n_classes + 1, d)
        oracle.add_features_from_sample_learned(
            torch.from_numpy(feats), torch.from_numpy(labels))
        bank, count = add_mean_features_v2(
            bank, count, jnp.asarray(feats), jnp.asarray(labels),
            n_classes=n_classes)
    # labels include a single-pixel class and an absent class so the
    # >1-pixels gate is exercised; class n_classes-1 left out of some
    feats = rng.randn(20, d).astype(np.float32)
    labels = np.concatenate([
        rng.randint(0, max(n_classes - 1, 1), size=(18,)),
        [n_classes - 1], [num_classes - 1]]).astype(np.int64)
    want = oracle.forward(
        torch.from_numpy(feats), torch.from_numpy(labels))
    got = feature_contrast_loss_v2(
        jnp.asarray(feats), jnp.asarray(labels), bank, count,
        negative=negative, n_classes=n_classes)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_forward_no_contributing_class_returns_zero():
    """Reference returns int 0 (negative=False) or crashes with
    ZeroDivisionError (negative=True) when nothing contributes; we
    return 0.0 in both cases (documented divergence)."""
    bank = jnp.zeros((3, 2, 4), jnp.float32)
    count = jnp.zeros((3,), jnp.int32)
    feats = jnp.asarray(np.random.RandomState(2).randn(5, 4),
                        dtype=jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1, 2])
    assert float(feature_contrast_loss_v2(
        feats, labels, bank, count)) == 0.0
    assert float(feature_contrast_loss_v2(
        feats, labels, bank, count, negative=True)) == 0.0
