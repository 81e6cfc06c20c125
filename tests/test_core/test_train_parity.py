"""TRAINING-step numeric parity vs an independent torch implementation.

Extends the forward-only harness (test_torch_parity.py) to the full
Mean-Teacher training loop (reference encoder_decoder.py:386-542 +
update_ema_variables:1044-1066 + SGD/poly-LR from apis/train.py +
core/builder.py): starting from identical weights, k steps of

    EMA update -> sup CE (main + aux) -> teacher pseudo-labels
    (eval-mode BN, conf>th, 255-ignore) -> unsup CE -> SGD(momentum,
    poly LR, head lr x10)

must produce the same per-step losses and the same final student/teacher
parameters in both frameworks to f32 tolerance. This pins the OPTIMIZER,
EMA, BN-statistics, pseudo-label and loss-reduction numerics — the
training dynamics, not just the forward — which is the strongest
mIoU-parity evidence obtainable without the dataset.

Deterministic setup: dropout_ratio=0 everywhere, no stochastic mixes
(MT-only SemiConfig), fixed batches. The torch BN mirrors flax's BIASED
running-var update (flax BatchNorm uses jnp.var; torch's unbiased n/(n-1)
correction is a documented micro-divergence — see PARITY.md).
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

BASE_LR, MAX_ITERS, MIN_LR, POWER = 0.01, 100, 1e-4, 0.9
EMA_M = 0.99
CONF_TH = 0.95
STEPS = 3
B = 2


class _BiasedBN(torch.nn.BatchNorm2d):
    """BatchNorm whose running_var update uses the BIASED batch variance,
    matching flax.linen.BatchNorm (torch uses the unbiased n/(n-1)
    estimate for the running stats)."""

    def forward(self, x):
        if not self.training:
            return super().forward(x)
        mean = x.mean(dim=(0, 2, 3))
        var = x.var(dim=(0, 2, 3), unbiased=False)
        with torch.no_grad():
            self.running_mean.mul_(1 - self.momentum).add_(
                self.momentum * mean)
            self.running_var.mul_(1 - self.momentum).add_(
                self.momentum * var)
        xn = (x - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + self.eps)
        return xn * self.weight[None, :, None, None] + \
            self.bias[None, :, None, None]


def _biased_bns(head):
    for i, bn in enumerate(head.bns):
        nb = _BiasedBN(bn.num_features, momentum=0.1)
        nb.load_state_dict(bn.state_dict())
        head.bns[i] = nb
    return head


def _ce_mean_all(logits_nchw, label, ignore=255):
    """CE, ignored pixels zeroed, mean over ALL pixels
    (avg_non_ignore=False reference reduction)."""
    per = F.cross_entropy(logits_nchw, label.long(), ignore_index=ignore,
                          reduction='sum')
    return per / label.numel()


class TorchMT:
    """Reference Mean-Teacher trainer on the torch mirror modules."""

    def __init__(self, seed=0):
        torch.manual_seed(seed)
        self.vit = TorchViT(out_indices=(1, 3))
        self.head = _biased_bns(TorchSETRUP(num_convs=2, up_scale=2))
        self.aux = [_biased_bns(TorchSETRUP(num_convs=1, up_scale=4))
                    for _ in range(2)]
        self.students = [self.vit, self.head] + self.aux
        self.teachers = [copy.deepcopy(m) for m in self.students]
        self.momentum = {id(p): torch.zeros_like(p)
                         for m in self.students for p in m.parameters()}
        self.step_i = 0

    def state_dict(self):
        sd = {}
        sd.update(_vit_sd(self.vit))
        sd.update(_head_sd('decode_head.', self.head))
        for i, a in enumerate(self.aux):
            sd.update(_head_sd(f'auxiliary_head.{i}.', a))
        return {k: v.detach().numpy() for k, v in sd.items()}

    def _forward(self, modules, img_nhwc, train):
        vit, head, *aux = modules
        for m in modules:
            m.train(train)
        x = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
        feats = vit(x)
        main = head(feats[1])
        auxs = [a(feats[0]) for a in aux]
        return main, auxs

    def _ema(self):
        with torch.no_grad():
            for s, t in zip(self.students, self.teachers):
                for ps, pt in zip(s.parameters(), t.parameters()):
                    pt.mul_(EMA_M).add_((1 - EMA_M) * ps)
                for (nb, bs_), (_, bt) in zip(s.named_buffers(),
                                              t.named_buffers()):
                    if 'num_batches_tracked' in nb:
                        continue
                    bt.mul_(EMA_M).add_((1 - EMA_M) * bs_)

    def train_step(self, batch):
        # 1. EMA from the PREVIOUS step's student (encoder_decoder.py:416)
        self._ema()
        losses = {}
        # 2. supervised pass (train-mode BN)
        main, auxs = self._forward(self.students, batch['sup_img'], True)
        gt = torch.from_numpy(batch['sup_gt'])
        main_up = F.interpolate(main, size=(IMG, IMG), mode='bilinear',
                                align_corners=False)
        losses['decode.loss_ce'] = _ce_mean_all(main_up, gt)
        for i, a in enumerate(auxs):
            a_up = F.interpolate(a, size=(IMG, IMG), mode='bilinear',
                                 align_corners=False)
            losses[f'aux_{i}.loss_ce'] = _ce_mean_all(a_up, gt)
        # 3. teacher pseudo-labels (eval-mode BN, no grad; :516-542)
        with torch.no_grad():
            t_main, _ = self._forward(self.teachers,
                                      batch['unsup_teacher_img'], False)
            probs = torch.softmax(t_main.float(), dim=1)
            max_prob, hard = probs.max(dim=1)
            hard[max_prob <= CONF_TH] = 255
        # 4. unsup student pass on the (unmixed, MT) student view
        s_main, _ = self._forward(self.students,
                                  batch['unsup_student_img'], True)
        losses['unsup.loss_seg_unsup'] = _ce_mean_all(s_main, hard)
        total = sum(losses.values())
        # 5. SGD momentum + poly LR + head lr x10
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
        self.step_i += 1
        return ({k: float(v.detach()) for k, v in losses.items()},
                float(total.detach()), lr)


def _batches(n=STEPS):
    rng = np.random.RandomState(7)
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
    # make some teacher pixels confident enough to train on: share the
    # student/teacher view so the pseudo path is exercised identically
    return out


@pytest.fixture(scope='module')
def pair():
    ref = TorchMT()
    sd = ref.state_dict()
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(IMG, IMG),
                      patch_size=P, embed_dims=C, num_layers=LAYERS,
                      num_heads=HEADS, out_indices=(1, 3),
                      use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=C, channels=16,
                         num_classes=NCLS, in_index=1, num_convs=2,
                         up_scale=2, align_corners=False),
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
    cfg = SemiConfig(ema=True, ema_momentum=EMA_M, unsup_weight=1.0,
                     unsup_confidence=CONF_TH)
    step = jax.jit(make_semi_train_step(
        model, cfg, num_classes=NCLS, base_lr=BASE_LR,
        max_iters=MAX_ITERS, power=POWER, min_lr=MIN_LR))
    return ref, state, step


def test_training_dynamics_parity(pair):
    ref, state, step = pair
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(_batches()):
        ref_losses, ref_total, ref_lr = ref.train_step(batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, logs = step(state, jb, key)
        assert np.isclose(float(logs['lr']), ref_lr, rtol=1e-6), i
        for k, v in ref_losses.items():
            got = float(logs[k])
            assert np.isclose(got, v, rtol=2e-3, atol=1e-5), \
                f'step {i} loss {k}: jax {got} vs torch {v}'
        assert np.isclose(float(logs['loss']), ref_total, rtol=2e-3), i

    # final parameter parity: student AND EMA teacher, one leaf per module
    sd = {}
    sd.update(_vit_sd(ref.vit))
    sd.update(_head_sd('decode_head.', ref.head))
    checks = [
        # (torch tensor, jax leaf, transform)
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
    # fp-reassociation noise (different fusion orders) amplified by the
    # head lr x10 accumulates ~4e-4 absolute over 3 steps; assert the
    # trajectories agree far below the actual parameter movement
    for tt, jl, tf in checks:
        got = np.asarray(jl)
        want = tf(tt).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-4)
        # and the match is meaningful: both frameworks moved the weights
        # by much more than the allowed mismatch
        assert np.abs(got - want).max() < 0.05 * max(
            float(np.abs(want).max()), 1e-3)
