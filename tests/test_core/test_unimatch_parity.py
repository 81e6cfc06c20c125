"""UniMatch-branch training-dynamics parity vs a literal torch oracle.

Mirrors the reference ``foward_unsup_train_unimatch``
(encoder_decoder.py:689-830): teacher pseudo-labels on the weak AND the
mix-source weak views -> PASA separate-head pass on the raw strong
stream (x0.5) -> TWO strong streams, each CutMix'd against its
mix-stream counterpart (images and teacher hard labels; the mixed
teacher info keeps the UNMIXED seg_logits/conf_mask per
generate_unsup_cutmix_data_unimatch, generate_unsup_data.py:456-489)
then PatchShuffled, each contributing 0.25*pseudo-CE + 0.25*NCR ->
SGD. CutMix boxes and shuffle perms are INJECTED into both sides
(dbg_um_* batch keys), like the full-flag harness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)
from tests.test_core.test_torch_parity import (C, GRID, HEADS, IMG, LAYERS,
                                               NCLS, P)
from tests.test_core.test_train_parity import _ce_mean_all
from tests.test_core.test_train_parity_fullflag import (
    ATTN_W, B, BASE_LR, CONF_TH, EMA_M, MAX_ITERS, MIN_LR, PATCHMIX_N,
    POWER, TorchS4, _ncr_unsup, _pasa_bias, _shuffle_img, _unshuffle_feat)

STEPS = 3


def _cutmix_um(imgs, mix_imgs, labels, mix_labels, masks):
    """generate_unsup_cutmix_data_unimatch (:456-489): inside the box
    (mask 0) take the SAME-INDEX mix stream's pixels and labels."""
    m = masks.unsqueeze(1)
    new_imgs = imgs * m + mix_imgs * (1 - m)
    new_labels = torch.where(masks > 0.5, labels, mix_labels)
    return new_imgs, new_labels


class TorchUniMatch(TorchS4):
    """Adds the UniMatch branch to the full-flag oracle (annealing off:
    momentum_head stays EMA_M like momentum_head_exp=0)."""

    def train_step_unimatch(self, batch, masks, perms):
        self._ema()
        losses = {}
        for m in self.students:
            m.train(True)
        sup = torch.from_numpy(batch['sup_img']).permute(0, 3, 1, 2)
        gt = torch.from_numpy(batch['sup_gt'])
        feats = self.vit(sup)
        main = self.head(feats[1])
        losses['decode.loss_ce'] = _ce_mean_all(main, gt)
        for i, a in enumerate(self.aux):
            a_up = torch.nn.functional.interpolate(
                a(feats[0]), size=(IMG, IMG), mode='bilinear',
                align_corners=False)
            losses[f'aux_{i}.loss_ce'] = _ce_mean_all(a_up, gt)

        def teacher_info(key):
            img = torch.from_numpy(batch[key]).permute(0, 3, 1, 2)
            with torch.no_grad():
                logits = self._decode(self.teachers, img, False)
                probs = torch.softmax(logits.float(), dim=1)
                max_prob, hard = probs.max(dim=1)
                conf = (max_prob > CONF_TH).float()
                hard = torch.where(conf > 0, hard,
                                   torch.full_like(hard, 255))
            return logits, hard, conf

        t_logits, t_hard, t_conf = teacher_info('unsup_teacher_img')
        _, tm_hard, _ = teacher_info('unsup_teacher_mix_img')

        # PASA separate-head pass on the RAW strong stream (:762-782)
        simg = torch.from_numpy(batch['unsup_student_img']
                                ).permute(0, 3, 1, 2)
        bias = _pasa_bias(t_conf)
        pasa_logits = self._decode(self.students, simg, True,
                                   attn_mask=bias)
        losses['unsup.loss_seg_unsup_attn_mask'] = \
            0.5 * _ce_mean_all(pasa_logits, t_hard)

        def stream(idx, img_key, mix_key):
            imgs = torch.from_numpy(batch[img_key]).permute(0, 3, 1, 2)
            mix = torch.from_numpy(batch[mix_key]).permute(0, 3, 1, 2)
            m_imgs, m_labels = _cutmix_um(imgs, mix, t_hard, tm_hard,
                                          masks[idx - 1])
            m_imgs = _shuffle_img(m_imgs, perms[idx - 1])
            logits = self._decode(self.students, m_imgs, True,
                                  perms=perms[idx - 1])
            losses[f'unsup.loss_seg_unsup_{idx}'] = \
                0.25 * _ce_mean_all(logits, m_labels)
            # NCR: UNMIXED teacher seg_logits, MIXED hard labels (the
            # mixed teacher_info keeps seg_logits from .copy())
            losses[f'unsup.loss_ncr_unsup_{idx}'] = \
                0.25 * _ncr_unsup(logits, t_logits, m_labels)

        stream(1, 'unsup_student_img', 'unsup_student_mix_img')
        stream(2, 'unsup_student_2_img', 'unsup_student_2_mix_img')

        total = sum(losses.values())
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
                float(total.detach()))


def _batches(n=STEPS):
    rng = np.random.RandomState(31)
    keys = ('sup_img', 'unsup_teacher_img', 'unsup_teacher_mix_img',
            'unsup_student_img', 'unsup_student_2_img',
            'unsup_student_mix_img', 'unsup_student_2_mix_img')
    out = []
    for _ in range(n):
        b = {k: rng.randn(B, IMG, IMG, 3).astype(np.float32) for k in keys}
        b['sup_gt'] = rng.randint(0, NCLS, (B, IMG, IMG)).astype(np.int32)
        out.append(b)
    return out


def _injected(step):
    masks = np.ones((2, B, IMG, IMG), np.float32)
    masks[0, 0, 4 + step:36 + step, 8:40] = 0
    masks[0, 1, 16:48, 12 + step:44 + step] = 0
    masks[1, 0, 0:32, 32:64] = 0
    masks[1, 1, 20 + step:52 + step, 0:32] = 0
    perms = np.stack([
        np.stack([np.roll(np.arange(4), step + 1),
                  np.array([2, 3, 0, 1])]),
        np.stack([np.arange(4) if step == 0 else np.array([3, 2, 1, 0]),
                  np.roll(np.arange(4), step)]),
    ]).astype(np.int32)
    return masks, perms


@pytest.fixture(scope='module')
def pair():
    ref = TorchUniMatch()
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
        ema=True, ema_momentum=EMA_M, unimatch=True, unsup_weight=1.0,
        unsup_confidence=CONF_TH,
        attn_mask_seperate_head=True, attn_mask_weight=ATTN_W,
        adaptive_attn_mask=True,
        use_PatchShuffle=True, PatchMix_N=PATCHMIX_N,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only',
        fuse_unsup_passes=False)
    step = jax.jit(make_semi_train_step(
        model, cfg, num_classes=NCLS, base_lr=BASE_LR,
        max_iters=MAX_ITERS, power=POWER, min_lr=MIN_LR))
    return ref, state, step


def test_unimatch_training_dynamics_parity(pair):
    ref, state, step = pair
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(_batches()):
        masks, perms = _injected(i)
        ref_losses, ref_total = ref.train_step_unimatch(
            batch, torch.from_numpy(masks), torch.from_numpy(perms))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb['dbg_um_cutmix_mask_1'] = jnp.asarray(masks[0])
        jb['dbg_um_cutmix_mask_2'] = jnp.asarray(masks[1])
        jb['dbg_um_patchmix_perm_1'] = jnp.asarray(perms[0])
        jb['dbg_um_patchmix_perm_2'] = jnp.asarray(perms[1])
        state, logs = step(state, jb, key)
        for k, v in ref_losses.items():
            got = float(logs[k])
            assert np.isclose(got, v, rtol=3e-3, atol=2e-5), \
                f'step {i} loss {k}: jax {got} vs torch {v}'
        assert np.isclose(float(logs['loss']), ref_total, rtol=3e-3), i
        assert ref_losses['unsup.loss_seg_unsup_1'] > 0
        assert ref_losses['unsup.loss_ncr_unsup_2'] > 0

    # final parameter parity (student + teacher)
    got = np.asarray(
        state.params['decode_head_m']['conv_seg']['kernel'])
    want = ref.head.conv_seg.weight.permute(2, 3, 1, 0).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=8e-4)
    got_t = np.asarray(
        state.ema_params['decode_head_m']['conv_seg']['kernel'])
    want_t = ref.teachers[1].conv_seg.weight.permute(
        2, 3, 1, 0).detach().numpy()
    np.testing.assert_allclose(got_t, want_t, rtol=5e-2, atol=8e-4)
