"""Parity tests for the semi-supervised building blocks.

Oracles are literal re-implementations of the reference's torch loops
(NCR: encoder_decoder.py:936-954; PASA: vit.py:519-535;
PatchShuffle undo: decode_head.py:186-212) run on CPU torch/numpy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s4former_tpu.models.decode_heads.base import (unshuffle_tokens)
from s4former_tpu.semi.mixes import (classmix, cutmix, cutout,
                                     patch_shuffle)
from s4former_tpu.semi.ncr import ncr_loss
from s4former_tpu.semi.pasa import build_pasa_bias, patch_unconfidence
from s4former_tpu.semi.pseudo import extract_teacher_info, pseudo_ce_loss


# ------------------------------------------------------------------- NCR
def _ncr_reference(student, teacher, label, num_classes):
    """Literal port of the reference unsup_only loop (:936-954)."""
    s = torch.from_numpy(student)  # [B,H,W,C] already permuted
    t = torch.from_numpy(teacher)
    lab = torch.from_numpy(label)
    pdist = torch.nn.PairwiseDistance(p=2)
    loss = torch.tensor(0.0)
    for ci in range(num_classes):
        sc = s[lab == ci]
        sc = torch.cat((sc[:, :ci], sc[:, ci + 1:]), dim=1)
        sc = F.softmax(sc, dim=1)
        tc = t[lab == ci]
        tc = torch.cat((tc[:, :ci], tc[:, ci + 1:]), dim=1)
        tc = F.softmax(tc, dim=1)
        loss = loss + torch.sum(pdist(sc, tc))
    b, h, w, _ = student.shape
    return float(loss / (b * h * w))


def test_ncr_unsup_only_matches_reference_loop():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 8, 8, 6
    student = rng.randn(b, h, w, c).astype(np.float32)
    teacher = rng.randn(b, h, w, c).astype(np.float32)
    label = rng.randint(0, c, (b, h, w)).astype(np.int64)
    label[0, :2, :2] = 255  # some ignored pixels
    ref = _ncr_reference(student, teacher, label, c)
    ours = float(ncr_loss(jnp.asarray(student), jnp.asarray(teacher),
                          jnp.asarray(label.astype(np.int32)), c,
                          'unsup_only'))
    assert abs(ours - ref) < 2e-4, (ours, ref)


def test_ncr_kl_mode_finite():
    rng = np.random.RandomState(1)
    s = jnp.asarray(rng.randn(1, 4, 4, 5), jnp.float32)
    t = jnp.asarray(rng.randn(1, 4, 4, 5), jnp.float32)
    lab = jnp.asarray(rng.randint(0, 5, (1, 4, 4)), jnp.int32)
    for mode in ('unsup_only_kl', 'reweight_unsup_only_kl', 'kl', 'all'):
        v = float(ncr_loss(s, t, lab, 5, mode))
        assert np.isfinite(v)


# ------------------------------------------------------------------ PASA
def _pasa_reference(attn_vec, weight, adaptive):
    """Literal port of vit.py:519-535 (attn_vec already has cls 0
    prepended)."""
    am = torch.from_numpy(attn_vec)
    if adaptive:
        amA = am.unsqueeze(1).repeat(1, am.size(-1), 1)
        mask = torch.topk(am[:, 1:], int(0.5 * (am.size(-1) - 1)), dim=-1,
                          largest=False)[1]
        mask = mask + 1
        amA[torch.arange(mask.size(0)).unsqueeze(1), mask, :] = 0
        am = amA
    else:
        am = am.unsqueeze(1).repeat(1, am.size(-1), 1)
    return (am * weight).numpy()


@pytest.mark.parametrize('adaptive', [False, True])
def test_pasa_bias_matches_reference(adaptive):
    rng = np.random.RandomState(2)
    b, l = 2, 16
    # distinct unconfidence values avoid top-k tie ambiguity
    unconf = rng.permutation(l * b).reshape(b, l).astype(np.float32) / (
        l * b)
    vec = np.concatenate([np.zeros((b, 1), np.float32), unconf], axis=1)
    ref = _pasa_reference(vec, 5.0, adaptive)
    ours = np.asarray(build_pasa_bias(jnp.asarray(unconf), 5.0, adaptive))
    np.testing.assert_allclose(ours[:, 0], ref, atol=1e-6)


def test_patch_unconfidence_pooling():
    conf = np.ones((1, 64, 64), np.int32)
    conf[0, :16, :16] = 0  # one fully-unconfident 16x16 patch
    u = np.asarray(patch_unconfidence(jnp.asarray(conf), 16))
    assert u.shape == (1, 16)
    assert u[0, 0] == 1.0 and np.all(u[0, 1:] == 0.0)


# --------------------------------------------------------- PatchShuffle
def test_patch_shuffle_roundtrip():
    """Shuffle an image; un-shuffling its 'features' (the image itself at
    patch granularity) must restore the original — the decode-head undo
    (decode_head.py:186-212)."""
    rng = np.random.RandomState(3)
    b, hw, n, ps = 3, 64, 2, 16
    imgs = jnp.asarray(rng.randn(b, hw, hw, 4), jnp.float32)
    shuffled, perm = patch_shuffle(jax.random.PRNGKey(0), imgs,
                                   patchmix_n=n, patch_size=ps,
                                   patchmix_ratio=1.0)
    # at least one sample actually permuted
    assert not np.allclose(np.asarray(shuffled), np.asarray(imgs))
    # treat each 16x16 patch mean as a "token" on the 4x4 patch grid
    def tokens(x):
        t = x.reshape(b, hw // ps, ps, hw // ps, ps, 4).mean((2, 4))
        return t.reshape(b, (hw // ps) ** 2, 4)
    restored = unshuffle_tokens(tokens(shuffled), perm, n)
    np.testing.assert_allclose(np.asarray(restored),
                               np.asarray(tokens(imgs)), rtol=1e-5,
                               atol=1e-5)


def test_patch_shuffle_identity_when_ratio_zero():
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                       jnp.float32)
    out, perm = patch_shuffle(jax.random.PRNGKey(1), imgs, 2, 16, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(perm),
                                  np.tile(np.arange(4), (2, 1)))


# ----------------------------------------------------------------- mixes
def test_cutmix_mixes_with_next_sample():
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (2, 32, 32)), jnp.int32)
    out_i, out_l = cutmix(jax.random.PRNGKey(0), imgs, labels)
    oi = np.asarray(out_i)
    # every output pixel comes from sample i or i+1
    src_self = np.isclose(oi[0], np.asarray(imgs)[0]).all(-1)
    src_next = np.isclose(oi[0], np.asarray(imgs)[1]).all(-1)
    assert np.all(src_self | src_next)
    assert src_next.any() and src_self.any()
    ol = np.asarray(out_l)
    assert set(np.unique(ol)).issubset(set(np.unique(np.asarray(labels))))


def test_cutout_sets_255():
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (2, 32, 32)), jnp.int32)
    out_i, out_l = cutout(jax.random.PRNGKey(0), imgs, labels)
    zeroed = np.all(np.asarray(out_i)[0] == 0, axis=-1)
    assert zeroed.any()
    assert np.all(np.asarray(out_l)[0][zeroed] == 255)


def test_classmix_mask_halves_classes():
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    labels = jnp.zeros((2, 32, 32), jnp.int32)
    labels = labels.at[:, :16].set(1).at[:, :, :8].set(2)
    out_i, out_l = classmix(jax.random.PRNGKey(2), imgs, labels, 5)
    assert np.asarray(out_l).shape == (2, 32, 32)
    assert np.isfinite(np.asarray(out_i)).all()


# ---------------------------------------------------------- pseudo labels
def test_extract_teacher_info_thresholding():
    logits = np.zeros((1, 4, 4, 3), np.float32)
    logits[0, 0, 0] = [10.0, 0.0, 0.0]   # confident class 0
    logits[0, 1, 1] = [0.1, 0.2, 0.15]   # unconfident
    info = extract_teacher_info(jnp.asarray(logits), 0.95)
    assert int(info.hard_label[0, 0, 0]) == 0
    assert int(info.conf_mask[0, 0, 0]) == 1
    assert int(info.conf_mask[0, 1, 1]) == 0
    assert int(info.hard_label[0, 1, 1]) == 255


def test_pseudo_ce_mean_over_all_pixels():
    """The pseudo loss averages over ALL pixels, ignored included in the
    denominator (compute_pseudo_loss: torch.mean, :908-935)."""
    logits = jnp.zeros((1, 2, 2, 2), jnp.float32)
    label = jnp.asarray([[[0, 255], [255, 255]]], jnp.int32)
    # CE at the single valid pixel = log(2); mean over 4 pixels
    expected = float(np.log(2) / 4)
    assert abs(float(pseudo_ce_loss(logits, label)) - expected) < 1e-6


def test_feature_contrast_v2_basic():
    """Sanity: contributing classes need >1 pixels AND >1 banked rows;
    empty-bank classes contribute 0. Exact-parity coverage lives in
    tests/test_core/test_feature_contrast_v2_parity.py (torch oracle)."""
    import jax.numpy as jnp
    import numpy as np
    from s4former_tpu.models.decode_heads.projection import \
        feature_contrast_loss_v2
    rng = np.random.RandomState(0)
    bank = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
    count = jnp.asarray([4, 4, 0])
    featsr = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    labr = jnp.asarray([0, 1, 0, 1, 2, 2])
    l1 = feature_contrast_loss_v2(featsr, labr, bank, count)
    l2 = feature_contrast_loss_v2(featsr, labr, bank, count,
                                  negative=True)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # class 2 has pixels but an empty bank: dropping it changes nothing
    l1b = feature_contrast_loss_v2(featsr[:4], labr[:4], bank, count)
    assert abs(float(l1) - float(l1b)) < 1e-6


def _ncr_sup_reference(student, teacher, label, num_classes):
    """Literal port of the SUP-branch loop (encoder_decoder.py:459-473):
    per class KL(log student || teacher) summed, PLUS the unconditional
    pairwise-L2 (the double-pdist quirk), normalized by B*H*W."""
    s = torch.from_numpy(student)
    t = torch.from_numpy(teacher)
    lab = torch.from_numpy(label)
    pdist = torch.nn.PairwiseDistance(p=2)
    loss = torch.tensor(0.0)
    for ci in range(num_classes):
        sc = s[lab == ci]
        sc = F.softmax(torch.cat((sc[:, :ci], sc[:, ci + 1:]), dim=1),
                       dim=1)
        tc = t[lab == ci]
        tc = F.softmax(torch.cat((tc[:, :ci], tc[:, ci + 1:]), dim=1),
                       dim=1)
        if len(sc) == 0:
            loss = loss + torch.sum(pdist(sc, tc))
        else:
            loss = loss + F.kl_div(torch.log(sc), tc, reduction='sum')
        loss = loss + torch.sum(pdist(sc, tc))
    b, h, w, _ = student.shape
    return float(loss / (b * h * w))


def test_ncr_sup_mode_matches_reference_loop():
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 8, 8, 6
    student = rng.randn(b, h, w, c).astype(np.float32)
    teacher = rng.randn(b, h, w, c).astype(np.float32)
    label = rng.randint(0, c, (b, h, w)).astype(np.int64)
    label[1, :3, :] = 255          # ignored pixels contribute nothing
    label[label == 5] = 0          # leave class 5 EMPTY (quirk branch)
    ref = _ncr_sup_reference(student, teacher, label, c)
    ours = float(ncr_loss(jnp.asarray(student), jnp.asarray(teacher),
                          jnp.asarray(label.astype(np.int32)), c, 'sup'))
    assert abs(ours - ref) < 5e-4, (ours, ref)
