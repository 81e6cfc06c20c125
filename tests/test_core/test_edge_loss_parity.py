"""EdgeLoss parity vs a literal torch port of the reference.

Oracle: mmseg/models/losses/edge_loss.py:253-336 with its non-runnable
scaffolding removed — the reference module is dead code that cannot even
import (`from config import cfg`, `.contrast_loss`, `.image_label` are
absent from its repo and the loss is not exported) — and the two
environment couplings made testable: `.cuda()` stripped, and the Gumbel
uniform draw injected instead of `torch.rand` (same technique as the
CutMix-mask injection in test_train_parity_fullflag.py). Everything
else is verbatim: the central-diff conv path (conv2d_same with the
0.5*[1,0,-1]*(-1) kernel), the dead convTri (early `return input` at
edge_loss.py:120), global-max magnitude normalization, tau=0.5
Gumbel-softmax over the class dim, the two >=1e-8 masked L1 means, and
the seg term's mean over non-255 pixels.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s4former_tpu.models.losses.extra_losses import EdgeLoss


# ---------------------------------------------------------------- oracle
def _conv2d_same(inp, kernel, groups):
    n, c, h, w = inp.shape
    kout, kicg, kh, kw = kernel.shape
    pw, ph = kw - 1, kh - 1
    inp = F.pad(inp, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(inp, kernel, groups=groups)


def _gradient_central_diff(inp):
    kernel_t = 0.5 * torch.Tensor([[1, 0, -1]]) * -1.
    c = inp.shape[1]
    x = _conv2d_same(
        inp, kernel_t.unsqueeze(0).unsqueeze(0).repeat([c, 1, 1, 1]), c)
    y = _conv2d_same(
        inp, kernel_t.t().unsqueeze(0).unsqueeze(0).repeat([c, 1, 1, 1]), c)
    return x, y


def _compute_grad_mag(e):
    e_ = e  # convTri(E, 4) is dead code: `return input` (edge_loss.py:120)
    ox, oy = _gradient_central_diff(e_)
    mag = torch.sqrt(ox * ox + oy * oy + 1e-6)
    return mag / mag.max()


def _gumbel_softmax_sample(logits, u, tau=0.5, eps=1e-10):
    noise = -torch.log(eps - torch.log(u + eps))
    return F.softmax((logits + noise) / tau, 1)


def _one_hot(labels, num_classes):
    y = torch.eye(num_classes)
    return y[labels].permute(0, 3, 1, 2)


def oracle_edge_loss(logits_nchw, gts, u, weight=None, wt=None,
                     with_edge=True, ignore_pixel=255):
    nll = torch.nn.NLLLoss(weight, reduction='none', ignore_index=255)
    seg_loss = nll(F.log_softmax(logits_nchw, dim=1), gts)
    if wt is not None:
        seg_loss = wt * seg_loss
    seg_loss_f = seg_loss[gts != 255].mean()
    if not with_edge:
        return seg_loss_f, torch.tensor(0.0)
    n, c, h, w = logits_nchw.shape
    th, eps = 1e-8, 1e-10
    ignore_mask = (gts == ignore_pixel).detach()
    lg = torch.where(ignore_mask.view(n, 1, h, w).expand(n, c, h, w),
                     torch.zeros(n, c, h, w), logits_nchw)
    gt_m = torch.where(ignore_mask, torch.zeros(n, h, w).long(), gts)
    gt_m = _one_hot(gt_m, c).detach()
    g = _gumbel_softmax_sample(lg.view(n, c, -1), u, tau=0.5)
    g = g.reshape((n, c, h, w))
    g = _compute_grad_mag(g)
    g_hat = _compute_grad_mag(gt_m)
    g = g.view(n, -1)
    g_hat = g_hat.contiguous().view(n, -1)
    loss_ewise = F.l1_loss(g, g_hat, reduction='none')
    m_g = (g >= th).detach().float()
    loss_g = torch.sum(loss_ewise * m_g) / (torch.sum(m_g) + eps)
    m_gh = (g_hat >= th).detach().float()
    loss_gh = torch.sum(loss_ewise * m_gh) / (torch.sum(m_gh) + eps)
    return seg_loss_f, 0.5 * loss_g + 0.5 * loss_gh


# ----------------------------------------------------------------- tests
def _case(seed=0, n=2, h=10, w=12, c=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w, c).astype(np.float32)
    label = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    label[0, :2, :3] = 255  # ignore region
    u = rng.rand(n, c, h * w).astype(np.float32)
    return logits, label, u


def test_seg_term_parity():
    logits, label, _ = _case()
    want, _ = oracle_edge_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(label), None, with_edge=False)
    got = EdgeLoss()(jnp.asarray(logits), jnp.asarray(label))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_seg_term_parity_class_weight_and_wt():
    logits, label, _ = _case(1)
    cw = np.asarray([0.5, 1.0, 2.0, 1.5, 0.1], np.float32)
    wt = np.random.RandomState(2).rand(*label.shape).astype(np.float32)
    want, _ = oracle_edge_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(label), None, weight=torch.from_numpy(cw),
        wt=torch.from_numpy(wt), with_edge=False)
    got = EdgeLoss(weight=cw)(jnp.asarray(logits), jnp.asarray(label),
                              wt=jnp.asarray(wt))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_full_loss_parity_injected_gumbel():
    logits, label, u = _case(3)
    seg, edge = oracle_edge_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(label), torch.from_numpy(u))
    got = EdgeLoss()(jnp.asarray(logits), jnp.asarray(label),
                     coarse=np.zeros((2,), bool),
                     gumbel_u=jnp.asarray(u))
    np.testing.assert_allclose(
        float(got), float(seg) + float(edge), rtol=2e-5)


def test_edge_term_zero_when_noEdge():
    logits, label, u = _case(4)
    want, _ = oracle_edge_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(label), None, with_edge=False)
    got = EdgeLoss(noEdge=True)(
        jnp.asarray(logits), jnp.asarray(label),
        coarse=np.zeros((2,), bool), gumbel_u=jnp.asarray(u))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
