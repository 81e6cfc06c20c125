"""FULL-FLAG training-dynamics parity vs an independent torch oracle.

Round-2's harness (test_train_parity.py) pinned MT-only dynamics. This one
runs the composed FLAGSHIP step — every `_MT_w_ours.py` flag on at once —
against a literal torch port of the reference path
(encoder_decoder.py:386-542 sup branch, :516-687 foward_unsup_train,
:906-1040 compute_pseudo_loss + annealing, vit.py:519-545 PASA,
generate_unsup_data.py:400-453/:737-819 mixes, decode_head.py:186-212
feature un-shuffle):

    EMA (per-module scope, annealed momentum_head) -> sup CE (main+aux)
    -> teacher pseudo-labels (low th so conf pixels exist) -> PASA
    separate-head pass (adaptive additive attention bias, x5, 0.5 loss)
    -> CutMix + PatchShuffle (randomness INJECTED as fixed masks/perms
    into both sides) -> final student pass with feature un-shuffle
    -> pseudo CE x0.5 + NCR(unsup_only) x0.5 -> SGD(momentum, poly LR,
    head lr x10) -> momentum_head <- mask_ratio**exp for the next step.

k steps of losses and the final student+teacher params must agree at f32
tolerance. fuse_unsup_passes=False so BatchNorm moments match the
reference's sequential passes exactly.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)
from tests.test_core.test_torch_parity import (C, GRID, HEADS, IMG, LAYERS,
                                               NCLS, P, TorchSETRUP,
                                               TorchViT, _head_sd, _vit_sd)
from tests.test_core.test_train_parity import (_BiasedBN, _biased_bns,
                                               _ce_mean_all)

BASE_LR, MAX_ITERS, MIN_LR, POWER = 0.01, 100, 1e-4, 0.9
EMA_M = 0.99
CONF_TH = 0.10          # low threshold: confident pixels from random init
ATTN_W = 5.0
PATCHMIX_N = 2          # super-patch = 2x2 tokens = 32x32 px; GG = 4
M_HEAD_EXP = 1.0
STEPS = 3
B = 2


# ------------------------------------------------------------ torch oracle
def _pasa_bias(conf_mask):
    """encoder_decoder.py:547-553 patch pooling + vit.py:519-535 mask.

    conf_mask: [B, IMG, IMG] float {0,1}. Returns [B*HEADS, T, T] additive
    (T = GRID^2 + 1)."""
    b = conf_mask.shape[0]
    r = conf_mask.view(b, GRID, P, GRID, P)
    r = (1 - r).permute(0, 1, 3, 2, 4).reshape(b, GRID, GRID, -1)
    am = torch.sum(r, -1) / (P * P)                      # [B, GRID, GRID]
    am = am.reshape(b, -1)
    am = torch.cat((torch.zeros(b, 1), am), -1)          # cls gets 0
    # adaptive: zero query rows of the most-confident 50% of patches
    amA = am.unsqueeze(1).repeat(1, am.size(-1), 1)
    mask = torch.topk(am[:, 1:], int(0.5 * (am.size(-1) - 1)), dim=-1,
                      largest=False)[1] + 1
    amA[torch.arange(b).unsqueeze(1), mask, :] = 0
    am = amA * ATTN_W
    am = am.unsqueeze(1).repeat(1, HEADS, 1, 1)
    return am.reshape(-1, am.size(-1), am.size(-1))


def _cutmix(imgs, labels, masks):
    """generate_unsup_cutmix_data (:400-453): i mixed with (i+1)%B under
    the given {0,1} masks (0 = take neighbour). seg_logits NOT mixed."""
    b = imgs.shape[0]
    m = masks.unsqueeze(1)
    new_imgs = torch.stack([
        imgs[i] * m[i] + imgs[(i + 1) % b] * (1 - m[i]) for i in range(b)])
    new_labels = torch.stack([
        torch.where(masks[i] > 0.5, labels[i], labels[(i + 1) % b])
        for i in range(b)])
    return new_imgs, new_labels


def _shuffle_img(imgs, perms):
    """generate_unsup_patchmix_data (:737-819): shuffled super-patch j =
    original super-patch perms[j] (row-major blocks)."""
    b, c, h, w = imgs.shape
    s = P * PATCHMIX_N
    g = h // s
    x = imgs.reshape(b, c, g, s, w // s, s).permute(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g * (w // s), c, s, s)
    x = torch.stack([x[i][perms[i]] for i in range(b)])
    x = x.reshape(b, g, w // s, c, s, s).permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def _unshuffle_feat(feat, perms):
    """decode_head.py:186-212 _repatchmix_inputs at feature resolution:
    original block p = shuffled block argsort(perm)[p]."""
    b, c, h, w = feat.shape
    n = PATCHMIX_N
    g = h // n
    x = feat.reshape(b, c, g, n, w // n, n).permute(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g * (w // n), c, n, n)
    inv = torch.argsort(perms, dim=1)
    x = torch.stack([x[i][inv[i]] for i in range(b)])
    x = x.reshape(b, g, w // n, c, n, n).permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def _ncr_unsup(student_logits, teacher_logits, label):
    """compute_pseudo_loss NCR unsup_only loop (:941-954)."""
    pdist = torch.nn.PairwiseDistance(p=2)
    s = student_logits.permute(0, 2, 3, 1)
    t = teacher_logits.permute(0, 2, 3, 1)
    loss = torch.tensor(0.0)
    for ci in range(NCLS):
        sc = s[label == ci]
        sc = F.softmax(torch.cat((sc[:, :ci], sc[:, ci + 1:]), 1), 1)
        tc = t[label == ci]
        tc = F.softmax(torch.cat((tc[:, :ci], tc[:, ci + 1:]), 1), 1)
        loss = loss + torch.sum(pdist(sc, tc))
    b, _, h, w = teacher_logits.shape
    return loss / (b * h * w)


class TorchS4:
    """Literal reference flagship trainer on the torch mirror modules."""

    def __init__(self, seed=0):
        torch.manual_seed(seed)
        self.vit = TorchViT(out_indices=(1, 3))
        # head output must equal input resolution like SETR-PUP at 512^2
        # (forward_get_logits never resizes): 4 -> 16 -> 64
        self.head = _biased_bns(TorchSETRUP(num_convs=2, up_scale=4))
        self.aux = [_biased_bns(TorchSETRUP(num_convs=1, up_scale=4))
                    for _ in range(2)]
        self.students = [self.vit, self.head] + self.aux
        self.teachers = [copy.deepcopy(m) for m in self.students]
        self.momentum = {id(p): torch.zeros_like(p)
                         for m in self.students for p in m.parameters()}
        self.step_i = 0
        self.m_head = EMA_M  # annealed after the first unsup step

    def state_dict(self):
        sd = {}
        sd.update(_vit_sd(self.vit))
        sd.update(_head_sd('decode_head.', self.head))
        for i, a in enumerate(self.aux):
            sd.update(_head_sd(f'auxiliary_head.{i}.', a))
        return {k: v.detach().numpy() for k, v in sd.items()}

    def _ema(self):
        """Scoped update (:416-423): backbone/aux plain EMA_M, decode_head
        the (possibly annealed) m_head; buffers with the same momentum."""
        mods = [(self.vit, EMA_M), (self.head, self.m_head),
                (self.aux[0], EMA_M), (self.aux[1], EMA_M)]
        with torch.no_grad():
            for (s, m), t in zip(mods, self.teachers):
                for ps, pt in zip(s.parameters(), t.parameters()):
                    pt.mul_(m).add_((1 - m) * ps)
                for (nb, bs_), (_, bt) in zip(s.named_buffers(),
                                              t.named_buffers()):
                    if 'num_batches_tracked' in nb:
                        continue
                    bt.mul_(m).add_((1 - m) * bs_)

    def _decode(self, modules, img, train, attn_mask=None, perms=None):
        vit, head = modules[0], modules[1]
        for m in (vit, head):
            m.train(train)
        feats = vit(img, attn_mask=attn_mask)
        f = feats[1]                                     # in_index=1
        if perms is not None:
            f = _unshuffle_feat(f, perms)
        return head(f)

    def train_step(self, batch, cutmix_mask, perms):
        self._ema()
        losses = {}
        # ---- sup branch (all heads, train BN)
        for m in self.students:
            m.train(True)
        sup = torch.from_numpy(batch['sup_img']).permute(0, 3, 1, 2)
        gt = torch.from_numpy(batch['sup_gt'])
        feats = self.vit(sup)
        main = self.head(feats[1])
        losses['decode.loss_ce'] = _ce_mean_all(main, gt)
        for i, a in enumerate(self.aux):
            a_up = F.interpolate(a(feats[0]), size=(IMG, IMG),
                                 mode='bilinear', align_corners=False)
            losses[f'aux_{i}.loss_ce'] = _ce_mean_all(a_up, gt)
        # ---- teacher pseudo-labels (eval BN, no grad; :516-542)
        timg = torch.from_numpy(batch['unsup_teacher_img']
                                ).permute(0, 3, 1, 2)
        with torch.no_grad():
            t_logits = self._decode(self.teachers, timg, False)
            probs = torch.softmax(t_logits.float(), dim=1)
            max_prob, hard = probs.max(dim=1)
            conf = (max_prob > CONF_TH).float()
            hard = torch.where(conf > 0, hard, torch.full_like(hard, 255))
            mask_ratio = conf.mean()
        simg = torch.from_numpy(batch['unsup_student_img']
                                ).permute(0, 3, 1, 2)
        # ---- PASA separate-head pass on UNMIXED strong images (:547-567)
        bias = _pasa_bias(conf)
        pasa_logits = self._decode(self.students, simg, True,
                                   attn_mask=bias)
        losses['unsup.loss_seg_unsup_attn_mask'] = \
            0.5 * _ce_mean_all(pasa_logits, hard)
        # ---- CutMix (injected mask) + PatchShuffle (injected perm)
        mix_imgs, mix_labels = _cutmix(simg, hard, cutmix_mask)
        mix_imgs = _shuffle_img(mix_imgs, perms)
        # ---- final pass, head un-shuffles features (:650-679)
        stu_logits = self._decode(self.students, mix_imgs, True,
                                  perms=perms)
        losses['unsup.loss_seg_unsup'] = \
            0.5 * _ce_mean_all(stu_logits, mix_labels)   # fdrop_loss_weight
        losses['unsup.loss_ncr_unsup'] = \
            0.5 * _ncr_unsup(stu_logits, t_logits, mix_labels)
        total = sum(losses.values())
        # ---- SGD momentum + poly LR + head lr x10
        for m in self.students:
            m.zero_grad(set_to_none=True)
        total.backward()
        prog = min(self.step_i / MAX_ITERS, 1.0)
        lr = (BASE_LR - MIN_LR) * (1 - prog) ** POWER + MIN_LR
        with torch.no_grad():
            for m, mult in [(self.vit, 1.0), (self.head, 10.0),
                            (self.aux[0], 10.0), (self.aux[1], 10.0)]:
                for p in m.parameters():
                    if p.grad is None:
                        continue
                    buf = self.momentum[id(p)]
                    buf.mul_(0.9).add_(p.grad)
                    p.add_(buf, alpha=-lr * mult)
        # ---- anneal for the NEXT step (:926-928)
        self.m_head = float(mask_ratio) ** M_HEAD_EXP
        self.step_i += 1
        return ({k: float(v.detach()) for k, v in losses.items()},
                float(total.detach()), float(mask_ratio))


# --------------------------------------------------------------- fixtures
def _batches(n=STEPS):
    rng = np.random.RandomState(11)
    out = []
    for _ in range(n):
        out.append({
            'sup_img': rng.randn(B, IMG, IMG, 3).astype(np.float32),
            'sup_gt': rng.randint(0, NCLS, (B, IMG, IMG)).astype(np.int32),
            'unsup_teacher_img':
                rng.randn(B, IMG, IMG, 3).astype(np.float32),
            'unsup_student_img':
                rng.randn(B, IMG, IMG, 3).astype(np.float32),
        })
    return out


def _injected_randomness(step):
    """Fixed CutMix boxes and PatchShuffle perms, different per step;
    one identity perm row exercises the gate-off path."""
    masks = np.ones((B, IMG, IMG), np.float32)
    masks[0, 8 + step:40 + step, 16:48] = 0
    masks[1, 0:32, 24 + step:56 + step] = 0
    perms = np.stack([
        np.roll(np.arange(4), step + 1),
        np.arange(4) if step == 1 else np.array([1, 0, 3, 2]),
    ]).astype(np.int32)
    return masks, perms


@pytest.fixture(scope='module')
def pair():
    ref = TorchS4()
    sd = ref.state_dict()
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(IMG, IMG),
                      patch_size=P, embed_dims=C, num_layers=LAYERS,
                      num_heads=HEADS, out_indices=(1, 3),
                      use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=C, channels=16,
                         num_classes=NCLS, in_index=1, num_convs=2,
                         up_scale=4, align_corners=False),
        auxiliary_head=[
            dict(type='SETRUPHead', in_channels=C, channels=16,
                 num_classes=NCLS, in_index=0, num_convs=1, up_scale=4,
                 align_corners=False) for _ in range(2)]))
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(sd, num_layers=LAYERS,
                                         dst_grid=(GRID, GRID), num_aux=2)
    variables = merge_pretrained(variables, converted)
    state = create_train_state(variables, ema=True)
    cfg = SemiConfig(
        ema=True, ema_momentum=EMA_M, unsup_weight=1.0,
        unsup_confidence=CONF_TH,
        attn_mask_seperate_head=True, attn_mask_weight=ATTN_W,
        adaptive_attn_mask=True,
        use_PatchShuffle_w_Cutmix=True, PatchMix_N=PATCHMIX_N,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only',
        momentum_head_exp=M_HEAD_EXP,
        fuse_unsup_passes=False)   # exact-parity: sequential BN like ref
    step = jax.jit(make_semi_train_step(
        model, cfg, num_classes=NCLS, base_lr=BASE_LR,
        max_iters=MAX_ITERS, power=POWER, min_lr=MIN_LR))
    return ref, state, step


def test_fullflag_training_dynamics_parity(pair):
    ref, state, step = pair
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(_batches()):
        masks, perms = _injected_randomness(i)
        ref_losses, ref_total, ref_mask_ratio = ref.train_step(
            batch, torch.from_numpy(masks), torch.from_numpy(perms))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb['dbg_cutmix_mask'] = jnp.asarray(masks)
        jb['dbg_patchmix_perm'] = jnp.asarray(perms)
        state, logs = step(state, jb, key)
        assert np.isclose(float(logs['mask_ratio']), ref_mask_ratio,
                          atol=1e-5), i
        for k, v in ref_losses.items():
            got = float(logs[k])
            assert np.isclose(got, v, rtol=3e-3, atol=2e-5), \
                f'step {i} loss {k}: jax {got} vs torch {v}'
        assert np.isclose(float(logs['loss']), ref_total, rtol=3e-3), i
        # the flags actually did something this step
        assert ref_losses['unsup.loss_seg_unsup_attn_mask'] > 0
        assert ref_losses['unsup.loss_ncr_unsup'] > 0

    # annealed momentum reached the state (next step's m_head)
    assert np.isclose(float(state.annealed_momentum),
                      ref.m_head, atol=1e-5)

    # final parameter parity: student AND EMA teacher across modules
    checks = [
        (ref.vit.blocks[0].fc1.weight,
         state.params['backbone_m']['layers']['block']['ffn']['fc1']
         ['kernel'][0], lambda t: t.T),
        (ref.vit.patch.weight,
         state.params['backbone_m']['patch_embed']['kernel'],
         lambda t: t.permute(2, 3, 1, 0)),
        (ref.head.conv_seg.weight,
         state.params['decode_head_m']['conv_seg']['kernel'],
         lambda t: t.permute(2, 3, 1, 0)),
        (ref.teachers[0].blocks[1].fc2.weight,
         state.ema_params['backbone_m']['layers']['block']['ffn']['fc2']
         ['kernel'][1], lambda t: t.T),
        (ref.teachers[1].conv_seg.weight,
         state.ema_params['decode_head_m']['conv_seg']['kernel'],
         lambda t: t.permute(2, 3, 1, 0)),
    ]
    for tt, jl, tf in checks:
        got = np.asarray(jl)
        want = tf(tt).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=8e-4)
        assert np.abs(got - want).max() < 0.05 * max(
            float(np.abs(want).max()), 1e-3)
