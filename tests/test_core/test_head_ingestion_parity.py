"""FCN/PSP/UPer head checkpoint-ingestion parity vs torch oracles.

Oracles mirror mmseg heads: FCNHead (fcn_head.py: stacked 3x3
ConvModules + optional concat_input), PSPHead (psp_head.py PPM:
AdaptiveAvgPool2d -> 1x1 ConvModule -> bilinear back, 3x3 bottleneck),
UPerHead (uper_head.py: PPM on the deepest level + FPN top-down).

The feature size (10x10) is deliberately NOT divisible by pool scales
3 and 6 — torch AdaptiveAvgPool2d covers border rows with variable
windows, which the matmul-form ``ops.resize.adaptive_avg_pool`` now
reproduces exactly (the old truncating pool dropped them).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_aspp_head,
                                          convert_fcn_head,
                                          convert_ocr_head,
                                          convert_psp_head,
                                          convert_uper_head,
                                          merge_pretrained)
from s4former_tpu.registry import HEADS


def build_head(cfg):
    return HEADS.build(cfg)

NCLS = 5
CH = 8


class TorchConvModule(torch.nn.Module):
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k,
                                    padding=dilation * (k - 1) // 2,
                                    dilation=dilation, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.5)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.bn.weight.normal_(1, 0.2)
            self.bn.bias.normal_(0, 0.2)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        sd[key + '.bn.weight'] = self.bn.weight
        sd[key + '.bn.bias'] = self.bn.bias
        sd[key + '.bn.running_mean'] = self.bn.running_mean
        sd[key + '.bn.running_var'] = self.bn.running_var


def _seg(sd, conv_seg, key='conv_seg'):
    sd[key + '.weight'] = conv_seg.weight
    sd[key + '.bias'] = conv_seg.bias


def _np_sd(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def _apply(head_cfg, converter, sd_np, feats):
    head = build_head(head_cfg)
    variables = head.init(jax.random.PRNGKey(0),
                          [jnp.asarray(f) for f in feats], train=False)
    p, bs = converter(sd_np)
    variables = merge_pretrained(
        variables, {'params': p, 'batch_stats': bs})
    return np.asarray(head.apply(variables,
                                 [jnp.asarray(f) for f in feats],
                                 train=False))


def test_fcn_head_ingestion_parity():
    torch.manual_seed(0)
    cin = 12
    convs = torch.nn.ModuleList([TorchConvModule(cin, CH, 3),
                                 TorchConvModule(CH, CH, 3)])
    conv_cat = TorchConvModule(cin + CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'convs.{i}')
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (*convs, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        y = convs[1](convs[0](x))
        y = conv_cat(torch.cat([x, y], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='FCNHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, num_convs=2, concat_input=True,
                      in_index=0, dropout_ratio=0),
                 convert_fcn_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def _torch_ppm(x, scales, mods, align=False):
    outs = [x]
    for s, m in zip(scales, mods):
        p = F.adaptive_avg_pool2d(x, s)
        p = m(p)
        outs.append(F.interpolate(p, size=x.shape[2:], mode='bilinear',
                                  align_corners=align))
    return outs


def test_psp_head_ingestion_parity():
    torch.manual_seed(1)
    cin = 12
    scales = (1, 2, 3, 6)
    ppm = torch.nn.ModuleList(TorchConvModule(cin, CH, 1)
                              for _ in scales)
    bottleneck = TorchConvModule(cin + 4 * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(ppm):
        m.dump(sd, f'psp_modules.{i}.1')
    bottleneck.dump(sd, 'bottleneck')
    _seg(sd, conv_seg)

    for m in (*ppm, bottleneck, conv_seg):
        m.eval()
    rng = np.random.RandomState(1)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        y = bottleneck(torch.cat(_torch_ppm(x, scales, ppm), 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='PSPHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, pool_scales=scales, in_index=0,
                      dropout_ratio=0),
                 convert_psp_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_uper_head_ingestion_parity():
    torch.manual_seed(2)
    cins = (6, 8, 12)
    scales = (1, 2, 3, 6)
    ppm = torch.nn.ModuleList(TorchConvModule(cins[-1], CH, 1)
                              for _ in scales)
    bottleneck = TorchConvModule(cins[-1] + 4 * CH, CH, 3)
    laterals = torch.nn.ModuleList(TorchConvModule(c, CH, 1)
                                   for c in cins[:-1])
    fpns = torch.nn.ModuleList(TorchConvModule(CH, CH, 3)
                               for _ in cins[:-1])
    fpn_bottleneck = TorchConvModule(3 * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(ppm):
        m.dump(sd, f'psp_modules.{i}.1')
    bottleneck.dump(sd, 'bottleneck')
    for i, m in enumerate(laterals):
        m.dump(sd, f'lateral_convs.{i}')
    for i, m in enumerate(fpns):
        m.dump(sd, f'fpn_convs.{i}')
    fpn_bottleneck.dump(sd, 'fpn_bottleneck')
    _seg(sd, conv_seg)

    for m in (*ppm, bottleneck, *laterals, *fpns, fpn_bottleneck,
              conv_seg):
        m.eval()
    rng = np.random.RandomState(2)
    feats = [rng.randn(2, hw, hw, c).astype(np.float32)
             for hw, c in zip((20, 10, 5), cins)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        psp = bottleneck(torch.cat(_torch_ppm(xs[-1], scales, ppm), 1))
        lats = [m(x) for m, x in zip(laterals, xs[:-1])] + [psp]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode='bilinear',
                align_corners=False)
        outs = [m(l) for m, l in zip(fpns, lats[:-1])] + [lats[-1]]
        outs = [o if o.shape[2:] == outs[0].shape[2:] else
                F.interpolate(o, size=outs[0].shape[2:], mode='bilinear',
                              align_corners=False) for o in outs]
        y = fpn_bottleneck(torch.cat(outs, 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='UPerHead', in_channels=cins, channels=CH,
                      num_classes=NCLS, pool_scales=scales,
                      in_index=(0, 1, 2), dropout_ratio=0),
                 convert_uper_head, _np_sd(sd), feats)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TorchBiasConv(torch.nn.Module):
    """ConvModule with norm_cfg=None: biased conv, no BN/act (FPN neck)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, padding=(k - 1) // 2)

    def forward(self, x):
        return self.conv(x)

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        sd[key + '.conv.bias'] = self.conv.bias


def test_fpn_neck_ingestion_parity():
    """FPN neck (necks/fpn.py): biased convs, NEAREST top-down upsample."""
    from s4former_tpu.core.checkpoint import convert_fpn_neck
    from s4former_tpu.registry import NECKS
    torch.manual_seed(7)
    cins, ch = (6, 8, 12, 16), 8
    lats = torch.nn.ModuleList(TorchBiasConv(c, ch, 1) for c in cins)
    fpns = torch.nn.ModuleList(TorchBiasConv(ch, ch, 3) for _ in cins)
    sd = {}
    for i, m in enumerate(lats):
        m.dump(sd, f'lateral_convs.{i}')
    for i, m in enumerate(fpns):
        m.dump(sd, f'fpn_convs.{i}')

    rng = np.random.RandomState(7)
    feats = [rng.randn(2, hw, hw, c).astype(np.float32)
             for hw, c in zip((40, 20, 10, 5), cins)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        ls = [m(x) for m, x in zip(lats, xs)]
        for i in range(len(ls) - 1, 0, -1):
            ls[i - 1] = ls[i - 1] + F.interpolate(
                ls[i], size=ls[i - 1].shape[2:], mode='nearest')
        refs = [m(l).permute(0, 2, 3, 1).numpy()
                for m, l in zip(fpns, ls)]

    neck = NECKS.build(dict(type='FPN', in_channels=cins, out_channels=ch,
                            num_outs=4))
    jf = [jnp.asarray(f) for f in feats]
    variables = neck.init(jax.random.PRNGKey(0), jf)
    p, bs = convert_fpn_neck(_np_sd(sd))
    variables = merge_pretrained(variables, {'params': p}, strict=True)
    outs = neck.apply(variables, jf)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=1e-4, atol=1e-4)


def test_fpn_head_ingestion_parity():
    """FPNHead (fpn_head.py): scale_heads Sequentials with param-free
    Upsample slots between ConvModules."""
    from s4former_tpu.core.checkpoint import convert_fpn_head
    torch.manual_seed(8)
    ch, strides = 8, (4, 8, 16, 32)
    cins = (8, 8, 8, 8)
    heads = []
    sd = {}
    for i, s in enumerate(strides):
        length = max(1, int(np.log2(s) - np.log2(strides[0])))
        mods = torch.nn.ModuleList(
            TorchConvModule(cins[i] if k == 0 else ch, ch, 3)
            for k in range(length))
        heads.append(mods)
        # Sequential slot index: conv at 0,2,4,... when upsample follows
        step = 2 if s != strides[0] else 1
        for k, m in enumerate(mods):
            m.dump(sd, f'scale_heads.{i}.{k * step}')
    conv_seg = torch.nn.Conv2d(ch, NCLS, 1)
    _seg(sd, conv_seg)

    for mods in heads:
        for m in mods:
            m.eval()
    conv_seg.eval()
    rng = np.random.RandomState(8)
    feats = [rng.randn(2, hw, hw, c).astype(np.float32)
             for hw, c in zip((32, 16, 8, 4), cins)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        out = None
        for i, s in enumerate(strides):
            y = xs[i]
            for m in heads[i]:
                y = m(y)
                if s != strides[0]:
                    y = F.interpolate(y, scale_factor=2, mode='bilinear',
                                      align_corners=False)
            if out is None:
                out = y
            else:
                if y.shape[2:] != out.shape[2:]:
                    y = F.interpolate(y, size=out.shape[2:],
                                      mode='bilinear', align_corners=False)
                out = out + y
        ref = conv_seg(out).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='FPNHead', in_channels=cins, channels=ch,
                      num_classes=NCLS, feature_strides=strides,
                      in_index=(0, 1, 2, 3), dropout_ratio=0),
                 convert_fpn_head, _np_sd(sd), feats)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TorchNonLocal(torch.nn.Module):
    """mmcv NonLocal2d embedded_gaussian (+ DNL extras when dnl=True)."""

    def __init__(self, c, reduction=2, dnl=False, temperature=0.05):
        super().__init__()
        ci = c // reduction
        self.ci, self.dnl, self.t = ci, dnl, temperature
        self.theta = torch.nn.Conv2d(c, ci, 1)
        self.phi = torch.nn.Conv2d(c, ci, 1)
        self.g = torch.nn.Conv2d(c, ci, 1)
        self.conv_out = torch.nn.Conv2d(ci, c, 1, bias=False)
        self.bn = torch.nn.BatchNorm2d(c)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)
        if dnl:
            self.conv_mask = torch.nn.Conv2d(c, 1, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.theta(x).view(n, self.ci, -1).permute(0, 2, 1)
        k = self.phi(x).view(n, self.ci, -1)
        v = self.g(x).view(n, self.ci, -1).permute(0, 2, 1)
        if self.dnl:
            q = q - q.mean(dim=-2, keepdim=True)
            k = k - k.mean(dim=-1, keepdim=True)
        sim = torch.matmul(q, k) / self.ci ** 0.5
        if self.dnl:
            sim = sim / self.t
        attn = sim.softmax(dim=-1)
        y = torch.matmul(attn, v)
        if self.dnl:
            unary = self.conv_mask(x).view(n, 1, -1).softmax(dim=-1)
            y = y + torch.matmul(unary, v)
        y = y.permute(0, 2, 1).reshape(n, self.ci, h, w)
        return x + self.bn(self.conv_out(y))

    def dump(self, sd, pre):
        for nm, m in (('theta', self.theta), ('phi', self.phi),
                      ('g', self.g)):
            sd[pre + nm + '.conv.weight'] = m.weight
            sd[pre + nm + '.conv.bias'] = m.bias
        sd[pre + 'conv_out.conv.weight'] = self.conv_out.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}conv_out.bn.{a}'] = getattr(self.bn, a)
        if self.dnl:
            sd[pre + 'conv_mask.weight'] = self.conv_mask.weight
            sd[pre + 'conv_mask.bias'] = self.conv_mask.bias


def _fcn_scaffold_ref(x, convs, block, conv_cat, conv_seg):
    y = convs[0](x)
    y = block(y)
    y = convs[1](y)
    y = conv_cat(torch.cat([x, y], 1))
    return conv_seg(y)


@pytest.mark.parametrize('kind', ['nl', 'dnl'])
def test_nl_dnl_head_ingestion_parity(kind):
    from s4former_tpu.core.checkpoint import convert_nl_head
    torch.manual_seed(14)
    cin = 12
    convs = torch.nn.ModuleList([TorchConvModule(cin, CH, 3),
                                 TorchConvModule(CH, CH, 3)])
    block = TorchNonLocal(CH, dnl=(kind == 'dnl')).eval()
    conv_cat = TorchConvModule(cin + CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'convs.{i}')
    block.dump(sd, f'{kind}_block.')
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (*convs, block, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(14)
    feat = rng.randn(2, 9, 7, cin).astype(np.float32)
    with torch.no_grad():
        ref = _fcn_scaffold_ref(
            torch.from_numpy(feat).permute(0, 3, 1, 2), convs, block,
            conv_cat, conv_seg).permute(0, 2, 3, 1).numpy()

    head_type = 'NLHead' if kind == 'nl' else 'DNLHead'
    got = _apply(dict(type=head_type, in_channels=cin, channels=CH,
                      num_classes=NCLS, concat_input=True, in_index=0,
                      dropout_ratio=0),
                 convert_nl_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gc_head_ingestion_parity():
    from s4former_tpu.core.checkpoint import convert_gc_head
    torch.manual_seed(15)
    cin, ratio_ch = 12, 2
    convs = torch.nn.ModuleList([TorchConvModule(cin, CH, 3),
                                 TorchConvModule(CH, CH, 3)])
    conv_mask = torch.nn.Conv2d(CH, 1, 1)
    add0 = torch.nn.Conv2d(CH, ratio_ch, 1)
    ln = torch.nn.LayerNorm([ratio_ch, 1, 1])
    add1 = torch.nn.Conv2d(ratio_ch, CH, 1)
    conv_cat = TorchConvModule(cin + CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    with torch.no_grad():
        ln.weight.normal_(1, 0.2)
        ln.bias.normal_(0, 0.2)

    def block(y):
        n, c, h, w = y.shape
        mask = conv_mask(y).view(n, 1, h * w).softmax(dim=-1)
        ctx = torch.matmul(y.view(n, 1, c, h * w),
                           mask.unsqueeze(-1)).view(n, c, 1, 1)
        t = add1(F.relu(ln(add0(ctx))))
        return y + t

    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'convs.{i}')
    sd['gc_block.conv_mask.weight'] = conv_mask.weight
    sd['gc_block.conv_mask.bias'] = conv_mask.bias
    sd['gc_block.channel_add_conv.0.weight'] = add0.weight
    sd['gc_block.channel_add_conv.0.bias'] = add0.bias
    sd['gc_block.channel_add_conv.1.weight'] = ln.weight
    sd['gc_block.channel_add_conv.1.bias'] = ln.bias
    sd['gc_block.channel_add_conv.3.weight'] = add1.weight
    sd['gc_block.channel_add_conv.3.bias'] = add1.bias
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (*convs, conv_mask, add0, ln, add1, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(15)
    feat = rng.randn(2, 9, 7, cin).astype(np.float32)
    with torch.no_grad():
        ref = _fcn_scaffold_ref(
            torch.from_numpy(feat).permute(0, 3, 1, 2), convs, block,
            conv_cat, conv_seg).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='GCHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, ratio=ratio_ch / CH,
                      concat_input=True, in_index=0, dropout_ratio=0),
                 convert_gc_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_apc_head_ingestion_parity():
    """APCHead (apc_head.py:11-160): SIGMOID affinities over adaptive
    region centers with a broadcast global-info term."""
    from s4former_tpu.core.checkpoint import convert_apc_head
    torch.manual_seed(16)
    cin, scales = 12, (1, 2, 3)
    acms = []
    sd = {}
    for i, s in enumerate(scales):
        mods = dict(
            pooled=TorchConvModule(cin, CH, 1),
            inp=TorchConvModule(cin, CH, 1),
            glob=TorchConvModule(CH, CH, 1),
            gla=torch.nn.Conv2d(CH, s * s, 1),
            residual=TorchConvModule(CH, CH, 1),
            fusion=TorchConvModule(CH, CH, 1))
        acms.append((s, mods))
        pre = f'acm_modules.{i}.'
        mods['pooled'].dump(sd, pre + 'pooled_redu_conv')
        mods['inp'].dump(sd, pre + 'input_redu_conv')
        mods['glob'].dump(sd, pre + 'global_info')
        sd[pre + 'gla.weight'] = mods['gla'].weight
        sd[pre + 'gla.bias'] = mods['gla'].bias
        mods['residual'].dump(sd, pre + 'residual_conv')
        mods['fusion'].dump(sd, pre + 'fusion_conv')
    bottleneck = TorchConvModule(cin + len(scales) * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    bottleneck.dump(sd, 'bottleneck')
    _seg(sd, conv_seg)

    for _, mods in acms:
        for m in mods.values():
            m.eval()
    bottleneck.eval()
    conv_seg.eval()
    rng = np.random.RandomState(16)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        outs = [raw]
        for s, mods in acms:
            pooled = mods['pooled'](F.adaptive_avg_pool2d(raw, s))
            x = mods['inp'](raw)
            gi = mods['glob'](F.adaptive_avg_pool2d(x, 1))
            gi = F.interpolate(gi, size=x.shape[2:], mode='bilinear',
                               align_corners=False)
            n = x.size(0)
            aff = torch.sigmoid(mods['gla'](x + gi)).permute(
                0, 2, 3, 1).reshape(n, -1, s * s)
            pv = pooled.view(n, CH, -1).permute(0, 2, 1)
            z = torch.matmul(aff, pv).permute(0, 2, 1).reshape(
                n, CH, *x.shape[2:])
            z = F.relu(mods['residual'](z) + x)
            outs.append(mods['fusion'](z))
        ref = conv_seg(bottleneck(torch.cat(outs, 1)))
        ref = ref.permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='APCHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, pool_scales=scales, fusion=True,
                      in_index=0, dropout_ratio=0),
                 convert_apc_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_dm_head_ingestion_parity():
    """DMHead (dm_head.py:11-152): dynamic per-channel correlation
    filters incl. the left-heavy even-size padding."""
    from s4former_tpu.core.checkpoint import convert_dm_head
    torch.manual_seed(17)
    cin, fsz = 12, (1, 2, 3)
    dcms = []
    sd = {}
    for i, fs in enumerate(fsz):
        mods = dict(gen=torch.nn.Conv2d(cin, CH, 1),
                    inp=TorchConvModule(cin, CH, 1),
                    norm=torch.nn.BatchNorm2d(CH))
        with torch.no_grad():
            mods['norm'].running_mean.normal_(0, 0.3)
            mods['norm'].running_var.uniform_(0.5, 2.0)
        dcms.append((fs, mods))
        pre = f'dcm_modules.{i}.'
        sd[pre + 'filter_gen_conv.weight'] = mods['gen'].weight
        sd[pre + 'filter_gen_conv.bias'] = mods['gen'].bias
        mods['inp'].dump(sd, pre + 'input_redu_conv')
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}norm.{a}'] = getattr(mods['norm'], a)
    bottleneck = TorchConvModule(cin + len(fsz) * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    bottleneck.dump(sd, 'bottleneck')
    _seg(sd, conv_seg)

    for _, mods in dcms:
        for m in mods.values():
            m.eval()
    bottleneck.eval()
    conv_seg.eval()
    rng = np.random.RandomState(17)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        outs = [raw]
        for fs, mods in dcms:
            filt = mods['gen'](F.adaptive_avg_pool2d(raw, fs))
            x = mods['inp'](raw)
            b, c, h, w = x.shape
            xr = x.reshape(1, b * c, h, w)
            fr = filt.reshape(b * c, 1, fs, fs)
            pad = (fs - 1) // 2
            p2d = (pad, pad, pad, pad) if (fs - 1) % 2 == 0 else \
                (pad + 1, pad, pad + 1, pad)
            xp = F.pad(xr, p2d)
            y = F.conv2d(xp, fr, groups=b * c).view(b, c, h, w)
            outs.append(F.relu(mods['norm'](y)))
        ref = conv_seg(bottleneck(torch.cat(outs, 1)))
        ref = ref.permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='DMHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, filter_sizes=fsz, fusion=False,
                      in_index=0, dropout_ratio=0),
                 convert_dm_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_ema_head_ingestion_parity():
    """EMAHead (ema_head.py:21-170): EM attention with ingested bases
    buffer; eval-mode forward (no buffer update)."""
    from s4former_tpu.core.checkpoint import convert_ema_head
    torch.manual_seed(18)
    cin, ema_c, k, stages = 12, 8, 4, 3
    ema_in = TorchConvModule(cin, ema_c, 3)
    ema_mid = torch.nn.Conv2d(ema_c, ema_c, 1)
    ema_out = TorchConvModule(ema_c, ema_c, 1)
    bottleneck = TorchConvModule(ema_c, CH, 3)
    conv_cat = TorchConvModule(cin + CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    bases = F.normalize(torch.randn(1, ema_c, k), dim=1, p=2)

    sd = {}
    ema_in.dump(sd, 'ema_in_conv')
    sd['ema_mid_conv.conv.weight'] = ema_mid.weight
    sd['ema_mid_conv.conv.bias'] = ema_mid.bias
    sd['ema_module.bases'] = bases
    ema_out.dump(sd, 'ema_out_conv')
    bottleneck.dump(sd, 'bottleneck')
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (ema_in, ema_mid, ema_out, bottleneck, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(18)
    feat = rng.randn(2, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        x = ema_in(raw)
        identity = x
        feats = ema_mid(x)
        b, c, h, w = feats.shape
        feats = feats.view(b, c, h * w)
        mu = bases.repeat(b, 1, 1)
        for _ in range(stages):
            attn = torch.einsum('bcn,bck->bnk', feats, mu).softmax(dim=2)
            attn_n = F.normalize(attn, dim=1, p=1)
            mu = torch.einsum('bcn,bnk->bck', feats, attn_n)
            mu = F.normalize(mu, dim=1, p=2)
        recon = torch.einsum('bck,bnk->bcn', mu, attn).view(b, c, h, w)
        recon = ema_out.bn(ema_out.conv(F.relu(recon)))
        y = F.relu(identity + recon)
        y = bottleneck(y)
        y = conv_cat(torch.cat([raw, y], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='EMAHead', in_channels=cin, channels=CH,
                      ema_channels=ema_c, num_bases=k, num_stages=stages,
                      num_classes=NCLS, concat_input=True, in_index=0,
                      dropout_ratio=0),
                 convert_ema_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


class TorchISASab(torch.nn.Module):
    def __init__(self, c, ci):
        super().__init__()
        self.ci = ci
        self.q0 = TorchConvModule(c, ci, 1)
        self.q1 = TorchConvModule(ci, ci, 1)
        self.k0 = TorchConvModule(c, ci, 1)
        self.k1 = TorchConvModule(ci, ci, 1)
        self.v = torch.nn.Conv2d(c, c, 1)
        self.out = TorchConvModule(c, c, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.q1(self.q0(x)).view(n, self.ci, -1).permute(0, 2, 1)
        k = self.k1(self.k0(x)).view(n, self.ci, -1)
        v = self.v(x).view(n, c, -1).permute(0, 2, 1)
        attn = (self.ci ** -0.5 * torch.matmul(q, k)).softmax(dim=-1)
        y = torch.matmul(attn, v).permute(0, 2, 1).reshape(n, c, h, w)
        return self.out(y)

    def dump(self, sd, pre):
        self.q0.dump(sd, pre + 'query_project.0')
        self.q1.dump(sd, pre + 'query_project.1')
        self.k0.dump(sd, pre + 'key_project.0')
        self.k1.dump(sd, pre + 'key_project.1')
        sd[pre + 'value_project.weight'] = self.v.weight
        sd[pre + 'value_project.bias'] = self.v.bias
        self.out.dump(sd, pre + 'output_project')


def test_isa_head_ingestion_parity():
    """ISAHead (isa_head.py:162-246): interlaced global/local attention
    on a pad-requiring grid (10x10 with down_factor (4,4))."""
    from s4former_tpu.core.checkpoint import convert_isa_head
    torch.manual_seed(19)
    import math
    cin, ci = 12, 4
    in_conv = TorchConvModule(cin, CH, 3)
    grel = TorchISASab(CH, ci)
    lrel = TorchISASab(CH, ci)
    out_conv = TorchConvModule(2 * CH, CH, 1)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    in_conv.dump(sd, 'in_conv')
    grel.dump(sd, 'global_relation.')
    lrel.dump(sd, 'local_relation.')
    out_conv.dump(sd, 'out_conv')
    _seg(sd, conv_seg)

    for m in (in_conv, grel, lrel, out_conv, conv_seg):
        m.eval()
    rng = np.random.RandomState(19)
    feat = rng.randn(1, 10, 10, cin).astype(np.float32)
    loc_h = loc_w = 4
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        x = in_conv(raw)
        residual = x
        n, c, h, w = x.shape
        glb_h, glb_w = math.ceil(h / loc_h), math.ceil(w / loc_w)
        pad_h, pad_w = glb_h * loc_h - h, glb_w * loc_w - w
        x = F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                      pad_h // 2, pad_h - pad_h // 2))
        x = x.view(n, c, glb_h, loc_h, glb_w, loc_w)
        x = x.permute(0, 3, 5, 1, 2, 4).reshape(-1, c, glb_h, glb_w)
        x = grel(x)
        x = x.view(n, loc_h, loc_w, c, glb_h, glb_w)
        x = x.permute(0, 4, 5, 3, 1, 2).reshape(-1, c, loc_h, loc_w)
        x = lrel(x)
        x = x.view(n, glb_h, glb_w, c, loc_h, loc_w)
        x = x.permute(0, 3, 1, 4, 2, 5).reshape(
            n, c, glb_h * loc_h, glb_w * loc_w)
        x = x[:, :, pad_h // 2:pad_h // 2 + h, pad_w // 2:pad_w // 2 + w]
        x = out_conv(torch.cat([x, residual], 1))
        ref = conv_seg(x).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='ISAHead', in_channels=cin, channels=CH,
                      isa_channels=ci, down_factor=(loc_h, loc_w),
                      num_classes=NCLS, in_index=0, dropout_ratio=0),
                 convert_isa_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_da_head_ingestion_parity():
    """DAHead (da_head.py:12-160): PAM (no scale, Scale gamma) + CAM
    (max-subtracted channel energies), summed features -> conv_seg."""
    from s4former_tpu.core.checkpoint import convert_da_head
    torch.manual_seed(20)
    cin, pam_c = 12, 4
    pam_in = TorchConvModule(cin, CH, 3)
    pam_q = torch.nn.Conv2d(CH, pam_c, 1)
    pam_k = torch.nn.Conv2d(CH, pam_c, 1)
    pam_v = torch.nn.Conv2d(CH, CH, 1)
    pam_gamma = torch.tensor(0.6)
    pam_out = TorchConvModule(CH, CH, 3)
    cam_in = TorchConvModule(cin, CH, 3)
    cam_gamma = torch.tensor(0.8)
    cam_out = TorchConvModule(CH, CH, 3)
    pam_seg = torch.nn.Conv2d(CH, NCLS, 1)
    cam_seg = torch.nn.Conv2d(CH, NCLS, 1)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)

    sd = {}
    pam_in.dump(sd, 'pam_in_conv')
    for nm, m in (('query', pam_q), ('key', pam_k), ('value', pam_v)):
        sd[f'pam.{nm}_project.weight'] = m.weight
        sd[f'pam.{nm}_project.bias'] = m.bias
    sd['pam.gamma.scale'] = pam_gamma
    pam_out.dump(sd, 'pam_out_conv')
    cam_in.dump(sd, 'cam_in_conv')
    sd['cam.gamma.scale'] = cam_gamma
    cam_out.dump(sd, 'cam_out_conv')
    _seg(sd, pam_seg, 'pam_conv_seg')
    _seg(sd, cam_seg, 'cam_conv_seg')
    _seg(sd, conv_seg)

    for m in (pam_in, pam_q, pam_k, pam_v, pam_out, cam_in, cam_out,
              pam_seg, cam_seg, conv_seg):
        m.eval()
    rng = np.random.RandomState(20)
    feat = rng.randn(2, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        pf = pam_in(raw)
        n, c, h, w = pf.shape
        q = pam_q(pf).view(n, pam_c, -1).permute(0, 2, 1)
        k = pam_k(pf).view(n, pam_c, -1)
        v = pam_v(pf).view(n, c, -1).permute(0, 2, 1)
        attn = torch.matmul(q, k).softmax(dim=-1)
        y = torch.matmul(attn, v).permute(0, 2, 1).reshape(n, c, h, w)
        pf = pam_out(pam_gamma * y + pf)
        cf = cam_in(raw)
        fq = cf.view(n, c, -1)
        energy = torch.bmm(fq, fq.permute(0, 2, 1))
        energy = energy.max(-1, keepdim=True)[0].expand_as(energy) - energy
        ca = energy.softmax(dim=-1)
        yc = torch.bmm(ca, fq).view(n, c, h, w)
        cf = cam_out(cam_gamma * yc + cf)
        ref = conv_seg(pf + cf).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='DAHead', in_channels=cin, channels=CH,
                      pam_channels=pam_c, num_classes=NCLS, in_index=0,
                      dropout_ratio=0),
                 convert_da_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_ann_head_ingestion_parity():
    """ANNHead (ann_head.py:16-256): AFNB low/high fusion with
    PPM-sampled keys/values, APNB with shared q/k."""
    from s4former_tpu.core.checkpoint import convert_ann_head
    torch.manual_seed(21)
    low_c, high_c, proj = 10, 12, 4
    scales = (1, 3, 6, 8)

    class Sab(torch.nn.Module):
        def __init__(self, kin, qin, out_c, share):
            super().__init__()
            self.kq = TorchConvModule(kin, proj, 1)
            self.q = self.kq if share else TorchConvModule(qin, proj, 1)
            self.v = torch.nn.Conv2d(kin, out_c, 1)
            self.o = torch.nn.Conv2d(out_c, out_c, 1)
            self.share = share

        def ppm(self, t):
            n, c = t.shape[:2]
            return torch.cat([F.adaptive_avg_pool2d(t, s).view(n, c, -1)
                              for s in scales], dim=2)

        def forward(self, qf, kf):
            n = qf.size(0)
            q = self.q(qf).reshape(n, proj, -1).permute(0, 2, 1)
            k = self.ppm(self.kq(kf))
            v = self.ppm(self.v(kf)).permute(0, 2, 1)
            attn = (proj ** -0.5 * torch.matmul(q, k)).softmax(dim=-1)
            y = torch.matmul(attn, v).permute(0, 2, 1)
            y = y.reshape(n, -1, *qf.shape[2:])
            return self.o(y)

        def dump(self, sd, pre):
            if not self.share:
                self.q.dump(sd, pre + 'query_project')
            self.kq.dump(sd, pre + 'key_project')
            sd[pre + 'value_project.weight'] = self.v.weight
            sd[pre + 'value_project.bias'] = self.v.bias
            sd[pre + 'out_project.weight'] = self.o.weight
            sd[pre + 'out_project.bias'] = self.o.bias

    afnb = Sab(low_c, high_c, high_c, share=False)
    fusion_bn = TorchConvModule(2 * high_c, high_c, 1)
    bottleneck = TorchConvModule(high_c, CH, 3)
    apnb = Sab(CH, CH, CH, share=True)
    ctx_bn = TorchConvModule(2 * CH, CH, 1)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)

    sd = {}
    afnb.dump(sd, 'fusion.stages.0.')
    fusion_bn.dump(sd, 'fusion.bottleneck')
    # AFNB shares the query ConvModule structure; its fusion bottleneck
    # has act=None in the ref — the oracle forward below skips its relu
    bottleneck.dump(sd, 'bottleneck')
    apnb.dump(sd, 'context.stages.0.')
    ctx_bn.dump(sd, 'context.bottleneck')
    _seg(sd, conv_seg)

    for m in (afnb, fusion_bn, bottleneck, apnb, ctx_bn, conv_seg):
        m.eval()
    rng = np.random.RandomState(21)
    low = rng.randn(1, 16, 16, low_c).astype(np.float32)
    high = rng.randn(1, 8, 8, high_c).astype(np.float32)
    with torch.no_grad():
        lo = torch.from_numpy(low).permute(0, 3, 1, 2)
        hi = torch.from_numpy(high).permute(0, 3, 1, 2)
        ctx = afnb(hi, lo)
        y = fusion_bn.bn(fusion_bn.conv(torch.cat([ctx, hi], 1)))
        y = bottleneck(y)
        ctx = apnb(y, y)
        y = ctx_bn(torch.cat([ctx, y], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='ANNHead', in_channels=(low_c, high_c),
                      channels=CH, project_channels=proj,
                      key_pool_scales=scales, num_classes=NCLS,
                      in_index=(0, 1), dropout_ratio=0),
                 convert_ann_head, _np_sd(sd), [low, high])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_enc_head_ingestion_parity():
    """EncHead (enc_head.py:13-190): encoding_project -> Encoding ->
    BN1d over codes -> ReLU -> mean -> Linear+Sigmoid;
    out = relu(x + x*gamma)."""
    from s4former_tpu.core.checkpoint import convert_enc_head
    torch.manual_seed(22)
    cin, k = 12, 4
    bottleneck = TorchConvModule(cin, CH, 3)
    proj = TorchConvModule(CH, CH, 1)
    codewords = torch.randn(k, CH) * 0.1
    scale = torch.rand(k) - 1.0
    enc_bn = torch.nn.BatchNorm1d(k)
    with torch.no_grad():
        enc_bn.running_mean.normal_(0, 0.3)
        enc_bn.running_var.uniform_(0.5, 2.0)
    fc = torch.nn.Linear(CH, CH)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)

    sd = {}
    bottleneck.dump(sd, 'bottleneck')
    proj.dump(sd, 'enc_module.encoding_project')
    sd['enc_module.encoding.0.codewords'] = codewords
    sd['enc_module.encoding.0.scale'] = scale
    for a in ('weight', 'bias', 'running_mean', 'running_var'):
        sd[f'enc_module.encoding.1.{a}'] = getattr(enc_bn, a)
    sd['enc_module.fc.0.weight'] = fc.weight
    sd['enc_module.fc.0.bias'] = fc.bias
    _seg(sd, conv_seg)

    for m in (bottleneck, proj, enc_bn, fc, conv_seg):
        m.eval()
    rng = np.random.RandomState(22)
    feat = rng.randn(2, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        x = bottleneck(raw)
        px = proj(x)
        b, c = px.size(0), px.size(1)
        f = px.view(b, c, -1).transpose(1, 2)        # [B, N, C]
        ex = f.unsqueeze(2) - codewords.view(1, 1, k, c)
        sl = scale.view(1, 1, k) * ex.pow(2).sum(3)
        a = torch.softmax(sl, dim=2)
        enc = (a.unsqueeze(3) * ex).sum(dim=1)       # [B, K, C]
        enc = F.relu(enc_bn(enc)).mean(dim=1)
        gamma = torch.sigmoid(fc(enc)).view(b, c, 1, 1)
        y = F.relu(x + x * gamma)
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='EncHead', in_channels=(cin,), channels=CH,
                      num_codes=k, num_classes=NCLS, in_index=(0,),
                      use_se_loss=False, add_lateral=False,
                      dropout_ratio=0),
                 convert_enc_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def _torch_psamask(a, mask_hw, collect):
    """mmcv psamask kernel semantics (psamask_cuda_kernel.cuh):
    collect: buffer[n, abs_source, predictor]; distribute:
    buffer[n, predictor, abs_target]."""
    n, _, h, w = a.shape
    mh, mw = mask_hw
    hh, hw_ = (mh - 1) // 2, (mw - 1) // 2
    out = torch.zeros(n, h * w, h * w)
    for i in range(h):
        for j in range(w):
            for mi in range(mh):
                for mj in range(mw):
                    si, sj = i + mi - hh, j + mj - hw_
                    if 0 <= si < h and 0 <= sj < w:
                        v = a[:, mi * mw + mj, i, j]
                        if collect:
                            out[:, si * w + sj, i * w + j] = v
                        else:
                            out[:, i * w + j, si * w + sj] = v
    return out


def test_psa_head_ingestion_parity():
    """PSAHead (psa_head.py:17-198): bi-direction, non-compact, shrink 2,
    mask smaller than the feature grid (the psamask crop path is live)."""
    from s4former_tpu.core.checkpoint import convert_psa_head
    torch.manual_seed(23)
    cin, mask = 12, (5, 5)
    reduce_c = TorchConvModule(cin, CH, 1)
    reduce_p = TorchConvModule(cin, CH, 1)
    att0 = TorchConvModule(CH, CH, 1)
    att1 = torch.nn.Conv2d(CH, mask[0] * mask[1], 1, bias=False)
    attp0 = TorchConvModule(CH, CH, 1)
    attp1 = torch.nn.Conv2d(CH, mask[0] * mask[1], 1, bias=False)
    proj = TorchConvModule(2 * CH, cin, 1)
    bottleneck = TorchConvModule(2 * cin, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)

    sd = {}
    reduce_c.dump(sd, 'reduce')
    reduce_p.dump(sd, 'reduce_p')
    att0.dump(sd, 'attention.0')
    sd['attention.1.weight'] = att1.weight
    attp0.dump(sd, 'attention_p.0')
    sd['attention_p.1.weight'] = attp1.weight
    proj.dump(sd, 'proj')
    bottleneck.dump(sd, 'bottleneck')
    _seg(sd, conv_seg)

    for m in (reduce_c, reduce_p, att0, att1, attp0, attp1, proj,
              bottleneck, conv_seg):
        m.eval()
    rng = np.random.RandomState(23)
    feat = rng.randn(1, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        idn = torch.from_numpy(feat).permute(0, 3, 1, 2)

        def branch(x, a0, a1, collect):
            n, c, h, w = x.shape
            h2, w2 = h // 2, w // 2
            x = F.interpolate(x, size=(h2, w2), mode='bilinear',
                              align_corners=False)
            y = a1(a0(x))
            y = _torch_psamask(y, mask, collect)
            y = F.softmax(y, dim=1)
            out = torch.bmm(x.view(n, c, h2 * w2), y)
            return out.view(n, c, h2, w2)

        col = branch(reduce_c(idn), att0, att1, True)
        dis = branch(reduce_p(idn), attp0, attp1, False)
        out = torch.cat([col, dis], 1)
        out = proj.bn(proj.conv(F.pad(out, (1, 1, 1, 1))))
        out = F.relu(out)
        out = F.interpolate(out, size=idn.shape[2:], mode='bilinear',
                            align_corners=False)
        y = bottleneck(torch.cat([idn, out], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='PSAHead', in_channels=cin, channels=CH,
                      mask_size=mask, psa_type='bi-direction',
                      shrink_factor=2, num_classes=NCLS, in_index=0,
                      dropout_ratio=0),
                 convert_psa_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_dpt_head_ingestion_parity():
    """DPTHead (dpt_head.py:14-293): parametric reassemble resizes,
    fusion blocks (block 0 skip-unit-free, x2 upsample align_corners
    TRUE), biased fusion projects."""
    from s4former_tpu.core.checkpoint import convert_dpt_head
    torch.manual_seed(24)
    emb, ppc, ch = 12, (4, 6, 8, 10), 8

    class RCU(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.c1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.b1 = torch.nn.BatchNorm2d(c)
            self.c2 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.b2 = torch.nn.BatchNorm2d(c)
            for b in (self.b1, self.b2):
                with torch.no_grad():
                    b.running_mean.normal_(0, 0.3)
                    b.running_var.uniform_(0.5, 2.0)

        def forward(self, x):
            y = self.b1(self.c1(F.relu(x)))
            y = self.b2(self.c2(F.relu(y)))
            return x + y

        def dump(self, sd, pre):
            for n, cv, bn in ((1, self.c1, self.b1), (2, self.c2,
                                                      self.b2)):
                sd[f'{pre}.conv{n}.conv.weight'] = cv.weight
                for a in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{pre}.conv{n}.bn.{a}'] = getattr(bn, a)

    projects = torch.nn.ModuleList(torch.nn.Conv2d(emb, c, 1)
                                   for c in ppc)
    rz0 = torch.nn.ConvTranspose2d(ppc[0], ppc[0], 4, stride=4)
    rz1 = torch.nn.ConvTranspose2d(ppc[1], ppc[1], 2, stride=2)
    rz3 = torch.nn.Conv2d(ppc[3], ppc[3], 3, stride=2, padding=1)
    convs = torch.nn.ModuleList(torch.nn.Conv2d(c, ch, 3, padding=1,
                                                bias=False) for c in ppc)
    rcu1s = torch.nn.ModuleList(RCU(ch) for _ in range(3))
    rcu2s = torch.nn.ModuleList(RCU(ch) for _ in range(4))
    fprojs = torch.nn.ModuleList(torch.nn.Conv2d(ch, ch, 1)
                                 for _ in range(4))
    final = TorchConvModule(ch, ch, 3)
    conv_seg = torch.nn.Conv2d(ch, NCLS, 1)

    sd = {}
    for i, m in enumerate(projects):
        sd[f'reassemble_blocks.projects.{i}.conv.weight'] = m.weight
        sd[f'reassemble_blocks.projects.{i}.conv.bias'] = m.bias
    for j, m in ((0, rz0), (1, rz1), (3, rz3)):
        sd[f'reassemble_blocks.resize_layers.{j}.weight'] = m.weight
        sd[f'reassemble_blocks.resize_layers.{j}.bias'] = m.bias
    for i, m in enumerate(convs):
        sd[f'convs.{i}.conv.weight'] = m.weight
    for i in range(4):
        if i > 0:
            rcu1s[i - 1].dump(sd, f'fusion_blocks.{i}.res_conv_unit1')
        rcu2s[i].dump(sd, f'fusion_blocks.{i}.res_conv_unit2')
        sd[f'fusion_blocks.{i}.project.conv.weight'] = fprojs[i].weight
        sd[f'fusion_blocks.{i}.project.conv.bias'] = fprojs[i].bias
    final.dump(sd, 'project')
    _seg(sd, conv_seg)

    mods = [*projects, rz0, rz1, rz3, *convs, *rcu1s, *rcu2s, *fprojs,
            final, conv_seg]
    for m in mods:
        m.eval()
    rng = np.random.RandomState(24)
    feats = [rng.randn(1, 4, 4, emb).astype(np.float32)
             for _ in range(4)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        outs = []
        for i, x in enumerate(xs):
            y = projects[i](x)
            if i == 0:
                y = rz0(y)
            elif i == 1:
                y = rz1(y)
            elif i == 3:
                y = rz3(y)
            outs.append(convs[i](y))
        x = None
        for blk, lvl in enumerate(range(3, -1, -1)):
            skip = outs[lvl]
            if blk == 0:
                x = skip
            else:
                if x.shape[2:] != skip.shape[2:]:
                    skip = F.interpolate(skip, size=x.shape[2:],
                                         mode='bilinear',
                                         align_corners=False)
                x = x + rcu1s[blk - 1](skip)
            x = rcu2s[blk](x)
            x = F.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=True)
            x = fprojs[blk](x)
        x = final(x)
        ref = conv_seg(x).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='DPTHead', in_channels=(emb,) * 4, channels=ch,
                      embed_dims=emb, post_process_channels=list(ppc),
                      num_classes=NCLS, in_index=(0, 1, 2, 3),
                      dropout_ratio=0),
                 convert_dpt_head, _np_sd(sd), feats)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_daformer_head_ingestion_parity():
    """DAFormerHead (daformer_head.py:124-191, canonical mlp embeds +
    sep-ASPP fusion with 3x3 bottleneck)."""
    from s4former_tpu.core.checkpoint import convert_daformer_head
    torch.manual_seed(25)
    cins, emb, dils = (6, 8, 10, 12), 8, (1, 2, 3)
    embeds = torch.nn.ModuleList(torch.nn.Linear(c, emb) for c in cins)
    branches = torch.nn.ModuleList(
        [TorchConvModule(4 * emb, CH, 1)] +
        [TorchSepConvModule(4 * emb, CH, 3, d) for d in dils[1:]])
    bottleneck = TorchConvModule(len(dils) * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(embeds):
        sd[f'embed_layers.{i}.proj.weight'] = m.weight
        sd[f'embed_layers.{i}.proj.bias'] = m.bias
    for i, m in enumerate(branches):
        m.dump(sd, f'fuse_layer.aspp_modules.{i}')
    bottleneck.dump(sd, 'fuse_layer.bottleneck')
    _seg(sd, conv_seg)

    for m in (*embeds, *branches, bottleneck, conv_seg):
        m.eval()
    rng = np.random.RandomState(25)
    feats = [rng.randn(1, hw, hw, c).astype(np.float32)
             for hw, c in zip((16, 8, 4, 2), cins)]
    with torch.no_grad():
        cs = []
        for i, f in enumerate(feats):
            t = embeds[i](torch.from_numpy(f))        # NHWC Linear
            t = t.permute(0, 3, 1, 2)
            if t.shape[2:] != (16, 16):
                t = F.interpolate(t, size=(16, 16), mode='bilinear',
                                  align_corners=False)
            cs.append(t)
        x = torch.cat(cs, 1)
        outs = [m(x) for m in branches]
        y = bottleneck(torch.cat(outs, 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(
        type='DAFormerHead', in_channels=cins, channels=CH,
        num_classes=NCLS, in_index=(0, 1, 2, 3), dropout_ratio=0,
        decoder_params=dict(
            embed_dims=emb, embed_cfg=dict(type='mlp'),
            embed_neck_cfg='same_as_embed_cfg',
            fusion_cfg=dict(type='aspp', sep=True, dilations=dils,
                            pool=False))),
        convert_daformer_head, _np_sd(sd), feats)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_knet_head_ingestion_parity():
    """IterativeDecodeHead (knet_head.py:16-453): seg kernels seeded
    from the generate head's conv_seg weight, KernelUpdator gating, MHA
    over proposals, FFN, mask fcs, dynamic 1x1 conv."""
    from s4former_tpu.core.checkpoint import convert_knet_head
    torch.manual_seed(26)
    cin, c, heads, ffn_ch = 12, 8, 2, 16

    class TorchKUpdator(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dynamic_layer = torch.nn.Linear(c, 2 * c)
            self.input_layer = torch.nn.Linear(c, 2 * c)
            self.input_gate = torch.nn.Linear(c, c)
            self.update_gate = torch.nn.Linear(c, c)
            for n in ('norm_in', 'norm_out', 'input_norm_in',
                      'input_norm_out', 'fc_norm'):
                setattr(self, n, torch.nn.LayerNorm(c))
            self.fc_layer = torch.nn.Linear(c, c)

        def forward(self, upd, inp):
            upd = upd.reshape(-1, c)
            params = self.dynamic_layer(upd)
            p_in, p_out = params[:, :c], params[:, c:]
            feats = self.input_layer(inp.reshape(upd.size(0), -1, c))
            i_in, i_out = feats[..., :c], feats[..., c:]
            gate = i_in * p_in.unsqueeze(-2)
            ig = torch.sigmoid(self.input_norm_in(self.input_gate(gate)))
            ug = torch.sigmoid(self.norm_in(self.update_gate(gate)))
            p_out = self.norm_out(p_out)
            i_out = self.input_norm_out(i_out)
            f = ug * p_out.unsqueeze(-2) + ig * i_out
            return F.relu(self.fc_norm(self.fc_layer(f)))

        def dump(self, sd, pre):
            for n in ('dynamic_layer', 'input_layer', 'input_gate',
                      'update_gate', 'fc_layer', 'norm_in', 'norm_out',
                      'input_norm_in', 'input_norm_out', 'fc_norm'):
                m = getattr(self, n)
                sd[pre + n + '.weight'] = m.weight
                sd[pre + n + '.bias'] = m.bias

    class TorchKUH(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.feat_transform = torch.nn.Conv2d(c, c, 1)
            self.attn = torch.nn.MultiheadAttention(c, heads,
                                                    batch_first=False)
            self.attention_norm = torch.nn.LayerNorm(c)
            self.ku = TorchKUpdator()
            self.ffn1 = torch.nn.Linear(c, ffn_ch)
            self.ffn2 = torch.nn.Linear(ffn_ch, c)
            self.ffn_norm = torch.nn.LayerNorm(c)
            self.mask_fcs = torch.nn.ModuleList()
            self.mask_lns = torch.nn.ModuleList()
            for _ in range(3):
                self.mask_fcs.append(torch.nn.Linear(c, c, bias=False))
                self.mask_lns.append(torch.nn.LayerNorm(c))
            self.fc_mask = torch.nn.Linear(c, c)

        def forward(self, x, kernels, masks):
            n, _, h, w = x.shape
            np_ = kernels.size(1)
            x = self.feat_transform(x)
            sm = masks.softmax(dim=1)
            x_feat = torch.einsum('bnhw,bchw->bnc', sm, x)
            obj = self.ku(x_feat, kernels.unsqueeze(2))
            obj = obj.reshape(n, np_, -1).permute(1, 0, 2)
            obj = self.attention_norm(
                self.attn(obj, obj, obj, need_weights=False)[0] + obj)
            obj = obj.permute(1, 0, 2)
            obj = self.ffn_norm(obj + self.ffn2(F.relu(self.ffn1(obj))))
            mf = obj
            for fc, lnm in zip(self.mask_fcs, self.mask_lns):
                mf = F.relu(lnm(fc(mf)))
            mf = self.fc_mask(mf)
            new_masks = torch.einsum('bchw,bnc->bnhw', x, mf)
            return obj, new_masks

        def dump(self, sd, pre):
            sd[pre + 'feat_transform.conv.weight'] = \
                self.feat_transform.weight
            sd[pre + 'feat_transform.conv.bias'] = \
                self.feat_transform.bias
            sd[pre + 'attention.attn.in_proj_weight'] = \
                self.attn.in_proj_weight
            sd[pre + 'attention.attn.in_proj_bias'] = \
                self.attn.in_proj_bias
            sd[pre + 'attention.attn.out_proj.weight'] = \
                self.attn.out_proj.weight
            sd[pre + 'attention.attn.out_proj.bias'] = \
                self.attn.out_proj.bias
            for n, m in (('attention_norm', self.attention_norm),
                         ('ffn_norm', self.ffn_norm)):
                sd[pre + n + '.weight'] = m.weight
                sd[pre + n + '.bias'] = m.bias
            self.ku.dump(sd, pre + 'kernel_update_conv.')
            sd[pre + 'ffn.layers.0.0.weight'] = self.ffn1.weight
            sd[pre + 'ffn.layers.0.0.bias'] = self.ffn1.bias
            sd[pre + 'ffn.layers.1.weight'] = self.ffn2.weight
            sd[pre + 'ffn.layers.1.bias'] = self.ffn2.bias
            for j in range(3):
                sd[pre + f'mask_fcs.{j * 3}.weight'] = \
                    self.mask_fcs[j].weight
                sd[pre + f'mask_fcs.{j * 3 + 1}.weight'] = \
                    self.mask_lns[j].weight
                sd[pre + f'mask_fcs.{j * 3 + 1}.bias'] = \
                    self.mask_lns[j].bias
            sd[pre + 'fc_mask.weight'] = self.fc_mask.weight
            sd[pre + 'fc_mask.bias'] = self.fc_mask.bias

    gen_conv = TorchConvModule(cin, c, 3)
    gen_seg = torch.nn.Conv2d(c, NCLS, 1)
    stages = torch.nn.ModuleList([TorchKUH(), TorchKUH()])
    sd = {}
    gen_conv.dump(sd, 'kernel_generate_head.convs.0')
    _seg(sd, gen_seg, 'kernel_generate_head.conv_seg')
    for i, m in enumerate(stages):
        m.dump(sd, f'kernel_update_head.{i}.')

    for m in (gen_conv, gen_seg, *stages):
        m.eval()
    rng = np.random.RandomState(26)
    feat = rng.randn(2, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        raw = torch.from_numpy(feat).permute(0, 3, 1, 2)
        feats = gen_conv(raw)
        masks = gen_seg(feats)
        kernels = gen_seg.weight[:, :, 0, 0][None].expand(2, NCLS, c)
        for m in stages:
            kernels, masks = m(feats, kernels, masks)
        ref = masks.permute(0, 2, 3, 1).numpy()

    head = build_head(dict(
        type='IterativeDecodeHead', in_channels=cin, channels=c,
        num_classes=NCLS, num_stages=2,
        kernel_generate_head=dict(
            type='FCNHead', in_channels=cin, channels=c, num_convs=1,
            concat_input=False, num_classes=NCLS, in_index=0,
            dropout_ratio=0),
        kernel_update_head=[dict(in_channels=c, out_channels=c,
                                 num_heads=heads,
                                 feedforward_channels=ffn_ch)] * 2,
        in_index=0))
    inputs = [jnp.asarray(feat)]
    variables = head.init(jax.random.PRNGKey(0), inputs, train=False)
    p, bs = convert_knet_head(_np_sd(sd))
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = np.asarray(head.apply(variables, inputs, train=False,
                                mutable=['intermediates'])[0])
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_projection_head_ingestion_parity():
    """S4Former ProjectionHead (projection_head.py:10-60): proj +
    predict towers (Linear, BN1d, ReLU, Linear)."""
    from s4former_tpu.core.checkpoint import convert_projection_head
    from s4former_tpu.registry import HEADS as REG
    torch.manual_seed(27)
    cin, ch = 12, 8
    towers = {}
    sd = {}
    for name in ('proj', 'predict'):
        inc = cin if name == 'proj' else ch
        fc1 = torch.nn.Linear(inc, ch)
        bn = torch.nn.BatchNorm1d(ch)
        fc2 = torch.nn.Linear(ch, ch)
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)
        towers[name] = (fc1, bn, fc2)
        sd[f'{name}.0.weight'] = fc1.weight
        sd[f'{name}.0.bias'] = fc1.bias
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{name}.1.{a}'] = getattr(bn, a)
        sd[f'{name}.3.weight'] = fc2.weight
        sd[f'{name}.3.bias'] = fc2.bias

    for mods in towers.values():
        for m in mods:
            m.eval()
    rng = np.random.RandomState(27)
    feat = rng.randn(16, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat)
        f1, bn, f2 = towers['proj']
        proj = f2(F.relu(bn(f1(x))))
        f1, bn, f2 = towers['predict']
        pred = f2(F.relu(bn(f1(proj)))).numpy()
        proj = proj.numpy()

    head = REG.build(dict(type='ProjectionHead', in_channels=cin,
                          channels=ch))
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    p, bs = convert_projection_head(_np_sd(sd))
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got_proj = np.asarray(head.apply(variables, jnp.asarray(feat)))
    got_pred = np.asarray(head.apply(variables, jnp.asarray(feat),
                                     predict=True))
    np.testing.assert_allclose(got_proj, proj, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_pred, pred, rtol=2e-4, atol=2e-4)


def test_feature_contrast_v1_ingestion_parity():
    """FeatureContrast v1 (feature_contrast.py:116-190): selector-
    weighted (1-cos) loss, eval-mode BN; the memory-side rescale is the
    reference's (1/w)*w == 1 no-op."""
    from s4former_tpu.core.checkpoint import convert_feature_contrast
    from s4former_tpu.registry import HEADS as REG
    torch.manual_seed(29)
    d, c, nmem, pix = 8, 3, 6, 20

    def make_sel():
        return torch.nn.Sequential(
            torch.nn.Linear(d, d), torch.nn.BatchNorm1d(d),
            torch.nn.LeakyReLU(0.2), torch.nn.Linear(d, 1))

    sels = [make_sel() for _ in range(c)]
    sels_m = [make_sel() for _ in range(c)]
    sd = {}
    for name, mods in (('contrastive_class_selector_', sels),
                       ('contrastive_class_selector_memory', sels_m)):
        for ci, m in enumerate(mods):
            pre = f'Selectors_head.{name}{ci}.'
            with torch.no_grad():
                m[1].running_mean.normal_(0, 0.3)
                m[1].running_var.uniform_(0.5, 2.0)
            sd[pre + '0.weight'] = m[0].weight
            sd[pre + '0.bias'] = m[0].bias
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{pre}1.{a}'] = getattr(m[1], a)
            sd[pre + '3.weight'] = m[3].weight
            sd[pre + '3.bias'] = m[3].bias
            m.eval()

    rng = np.random.RandomState(29)
    feats = rng.randn(pix, d).astype(np.float32)
    labels = rng.randint(0, c, (pix,)).astype(np.int32)
    bank = rng.randn(c, nmem, d).astype(np.float32)
    count = np.array([nmem, 4, 0], np.int32)  # class 2 inactive
    with torch.no_grad():
        loss = 0.0
        tf = torch.from_numpy(feats)
        for ci in range(c):
            mc = torch.from_numpy(labels) == ci
            fc = tf[mc]
            n_c = int(count[ci])
            if n_c > 1 and fc.shape[0] > 1:
                mem = F.normalize(torch.from_numpy(bank[ci, :n_c]), dim=1)
                fn = F.normalize(fc, dim=1)
                distances = 1 - torch.mm(fn, mem.t())
                w = torch.sigmoid(sels[ci](fc))
                w = (w.shape[0] / w.sum(dim=0)) * w
                distances = distances * w.repeat(1, distances.shape[1])
                wm = torch.sigmoid(sels_m[ci](mem)).permute(1, 0)
                wm = (wm.shape[0] / wm.sum(dim=0)) * wm
                distances = distances * wm.repeat(distances.shape[0], 1)
                loss = loss + distances.mean()
        ref = float(loss) / c

    mod = REG.build(dict(type='FeatureContrast', channels=d,
                         num_classes=c, num_samples=4))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(labels), jnp.asarray(bank),
                         jnp.asarray(count))
    p, bs = convert_feature_contrast(_np_sd(sd))
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = float(mod.apply(variables, jnp.asarray(feats),
                          jnp.asarray(labels), jnp.asarray(bank),
                          jnp.asarray(count)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_ic_neck_ingestion_parity():
    """ICNeck (ic_neck.py:9-150): dilated conv_low on the upsampled low
    branch, (x_24, x_12, x_cff_12) output order."""
    from s4former_tpu.core.checkpoint import convert_ic_neck
    from s4former_tpu.registry import NECKS
    torch.manual_seed(34)
    cins, outc = (6, 8, 10), 4
    cff24_low = TorchConvModule(cins[2], outc, 3, dilation=2)
    cff24_high = TorchConvModule(cins[1], outc, 1)
    cff12_low = TorchConvModule(outc, outc, 3, dilation=2)
    cff12_high = TorchConvModule(cins[0], outc, 1)
    sd = {}
    cff24_low.dump(sd, 'cff_24.conv_low')
    cff24_high.dump(sd, 'cff_24.conv_high')
    cff12_low.dump(sd, 'cff_12.conv_low')
    cff12_high.dump(sd, 'cff_12.conv_high')

    for m in (cff24_low, cff24_high, cff12_low, cff12_high):
        m.eval()
    rng = np.random.RandomState(34)
    feats = [rng.randn(1, hw, hw, c).astype(np.float32)
             for hw, c in zip((16, 8, 4), cins)]
    with torch.no_grad():
        s1, s2, s4 = [torch.from_numpy(f).permute(0, 3, 1, 2)
                      for f in feats]
        low = F.interpolate(s4, size=s2.shape[2:], mode='bilinear',
                            align_corners=False)
        x24 = cff24_low(low)
        cff24 = F.relu(x24 + cff24_high(s2))
        low = F.interpolate(cff24, size=s1.shape[2:], mode='bilinear',
                            align_corners=False)
        x12 = cff12_low(low)
        cff12 = F.relu(x12 + cff12_high(s1))
        refs = [x24, x12, cff12]

    neck = NECKS.build(dict(type='ICNeck', in_channels=cins,
                            out_channels=outc))
    jf = [jnp.asarray(f) for f in feats]
    variables = neck.init(jax.random.PRNGKey(0), jf, train=False)
    p, bs = convert_ic_neck(_np_sd(sd))
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    outs = neck.apply(variables, jf, train=False)
    for i, (g, r) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'out {i}')


def test_multilevel_neck_ingestion_parity():
    """MultiLevelNeck (multilevel_neck.py:9-74): biased laterals,
    single-input duplication, per-scale bilinear + biased 3x3."""
    from s4former_tpu.core.checkpoint import convert_multilevel_neck
    from s4former_tpu.registry import NECKS
    torch.manual_seed(35)
    cin, outc = 6, 4
    lat = torch.nn.Conv2d(cin, outc, 1)
    convs = torch.nn.ModuleList(torch.nn.Conv2d(outc, outc, 3, padding=1)
                                for _ in range(4))
    sd = {'lateral_convs.0.conv.weight': lat.weight,
          'lateral_convs.0.conv.bias': lat.bias}
    for i, m in enumerate(convs):
        sd[f'convs.{i}.conv.weight'] = m.weight
        sd[f'convs.{i}.conv.bias'] = m.bias

    rng = np.random.RandomState(35)
    feat = rng.randn(1, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        x = lat(torch.from_numpy(feat).permute(0, 3, 1, 2))
        refs = []
        for i, s in enumerate((0.5, 1, 2, 4)):
            y = F.interpolate(x, scale_factor=s, mode='bilinear') \
                if s != 1 else x
            refs.append(convs[i](y))

    neck = NECKS.build(dict(type='MultiLevelNeck', in_channels=[cin],
                            out_channels=outc))
    jf = [jnp.asarray(feat)]
    v = neck.init(jax.random.PRNGKey(0), jf)
    p, _ = convert_multilevel_neck(_np_sd(sd))
    v = merge_pretrained(v, {'params': p}, strict=True)
    outs = neck.apply(v, jf)
    for i, (g, r) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'out {i}')


def test_feature2pyramid_ingestion_parity():
    """Feature2Pyramid (featurepyramid.py:8-75): parametric deconv
    upsamples + BN + GELU."""
    from s4former_tpu.core.checkpoint import convert_feature2pyramid_neck
    from s4former_tpu.registry import NECKS
    torch.manual_seed(36)
    dim = 6
    d1 = torch.nn.ConvTranspose2d(dim, dim, 2, stride=2)
    bn = torch.nn.BatchNorm1d(dim)  # placeholder for dump shape
    bn = torch.nn.BatchNorm2d(dim)
    d2 = torch.nn.ConvTranspose2d(dim, dim, 2, stride=2)
    d3 = torch.nn.ConvTranspose2d(dim, dim, 2, stride=2)
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.3)
        bn.running_var.uniform_(0.5, 2.0)
    sd = {'upsample_4x.0.weight': d1.weight, 'upsample_4x.0.bias': d1.bias,
          'upsample_4x.1.weight': bn.weight, 'upsample_4x.1.bias': bn.bias,
          'upsample_4x.1.running_mean': bn.running_mean,
          'upsample_4x.1.running_var': bn.running_var,
          'upsample_4x.3.weight': d2.weight, 'upsample_4x.3.bias': d2.bias,
          'upsample_2x.0.weight': d3.weight, 'upsample_2x.0.bias': d3.bias}

    for m in (d1, bn, d2, d3):
        m.eval()
    rng = np.random.RandomState(36)
    feats = [rng.randn(1, 4, 4, dim).astype(np.float32)
             for _ in range(4)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        refs = [d2(F.gelu(bn(d1(xs[0])))), d3(xs[1]), xs[2],
                F.max_pool2d(xs[3], 2, 2)]

    neck = NECKS.build(dict(type='Feature2Pyramid', embed_dim=dim))
    jf = [jnp.asarray(f) for f in feats]
    v = neck.init(jax.random.PRNGKey(0), jf, train=False)
    p, bs = convert_feature2pyramid_neck(_np_sd(sd))
    v = merge_pretrained(v, {'params': p, 'batch_stats': bs}, strict=True)
    outs = neck.apply(v, jf, train=False)
    for i, (g, r) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'out {i}')


def test_jpu_neck_ingestion_parity():
    """JPU (jpu.py:10-123): per-level ConvModules, bilinear upsample,
    concat; DW-separable dilation branches (dw BN no-act) concatenated;
    returns inputs[:-1] + [concat]."""
    from s4former_tpu.core.checkpoint import convert_jpu_neck
    from s4former_tpu.registry import NECKS
    torch.manual_seed(37)
    cins, mid, dils = (6, 8, 10), 4, (1, 2)
    convs = torch.nn.ModuleList(TorchConvModule(c, mid, 3) for c in cins)
    dl = torch.nn.ModuleList(
        TorchSepConvModule(3 * mid, mid, 3, d) for d in dils)

    class SepNoDwAct2(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x):
            i = self.inner
            return i.pointwise_conv(i.depthwise_conv.bn(
                i.depthwise_conv.conv(x)))

    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'conv_layers.{i}.0')
    for i, m in enumerate(dl):
        m.dump(sd, f'dilation_layers.{i}.0')

    for m in (*convs, *dl):
        m.eval()
    rng = np.random.RandomState(37)
    feats = [rng.randn(1, hw, hw, c).astype(np.float32)
             for hw, c in zip((16, 8, 4), cins)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        fs = [convs[i](x) for i, x in enumerate(xs)]
        for i in range(1, 3):
            fs[i] = F.interpolate(fs[i], size=fs[0].shape[2:],
                                  mode='bilinear', align_corners=False)
        cat = torch.cat(fs, 1)
        outs = torch.cat([SepNoDwAct2(m)(cat) for m in dl], 1)
        refs = [xs[0], xs[1], outs]

    neck = NECKS.build(dict(type='JPU', in_channels=cins,
                            mid_channels=mid, dilations=dils))
    jf = [jnp.asarray(f) for f in feats]
    v = neck.init(jax.random.PRNGKey(0), jf, train=False)
    p, bs = convert_jpu_neck(_np_sd(sd))
    v = merge_pretrained(v, {'params': p, 'batch_stats': bs}, strict=True)
    outs2 = neck.apply(v, jf, train=False)
    for i, (g, r) in enumerate(zip(outs2, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'out {i}')


def test_stdc_boundary_targets_parity():
    """stdc_boundary_targets vs a literal port of STDCHead.losses'
    boundary construction (stdc_head.py:29-85)."""
    from s4former_tpu.models.decode_heads.extra_heads import \
        stdc_boundary_targets
    rng = np.random.RandomState(28)
    label = rng.randint(0, 5, (2, 17, 19)).astype(np.float32)
    lk = torch.tensor([-1, -1, -1, -1, 8, -1, -1, -1, -1],
                      dtype=torch.float32).reshape(1, 1, 3, 3)
    fk = torch.tensor([[6. / 10], [3. / 10], [1. / 10]],
                      dtype=torch.float32).reshape(1, 3, 1, 1)
    th = 0.1
    with torch.no_grad():
        x = torch.from_numpy(label)[:, None]
        b1 = F.conv2d(x, lk, padding=1).clamp(min=0)
        b1 = (b1 > th).float()
        b2 = F.conv2d(x, lk, stride=2, padding=1).clamp(min=0)
        b4 = F.conv2d(x, lk, stride=4, padding=1).clamp(min=0)
        b2 = (F.interpolate(b2, b1.shape[2:], mode='nearest') > th).float()
        b4 = (F.interpolate(b4, b1.shape[2:], mode='nearest') > th).float()
        pyr = torch.stack((b1, b2, b4), dim=1).squeeze(2)
        fused = F.conv2d(pyr, fk)
        ref = (fused > th).float()[:, 0].numpy()

    got = np.asarray(stdc_boundary_targets(
        jnp.asarray(label.astype(np.int32)), th))
    np.testing.assert_allclose(got, ref)


def test_sep_fcn_head_ingestion_parity():
    """DepthwiseSeparableFCNHead (sep_fcn_head.py): dw_act_cfg=None, so
    every depthwise conv is BN-only."""
    from s4former_tpu.core.checkpoint import convert_sep_fcn_head
    torch.manual_seed(12)
    cin = 12

    class SepNoDwAct(TorchSepConvModule):
        def forward(self, x):
            return self.pointwise_conv(
                self.depthwise_conv.bn(self.depthwise_conv.conv(x)))

    convs = torch.nn.ModuleList([SepNoDwAct(cin, CH, 3),
                                 SepNoDwAct(CH, CH, 3)])
    conv_cat = SepNoDwAct(cin + CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'convs.{i}')
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (*convs, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(12)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        y = convs[1](convs[0](x))
        y = conv_cat(torch.cat([x, y], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='DepthwiseSeparableFCNHead', in_channels=cin,
                      channels=CH, num_classes=NCLS, num_convs=2,
                      concat_input=True, in_index=0, dropout_ratio=0),
                 convert_sep_fcn_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_lraspp_head_ingestion_parity():
    """LRASPPHead (lraspp_head.py): AvgPool(49, (16,20)) sigmoid gate,
    bias-free skip convs, biased conv_up_input."""
    from s4former_tpu.core.checkpoint import convert_lraspp_head
    torch.manual_seed(13)
    cins, bcs, ch = (6, 8, 12), (3, 4), 8
    convs = torch.nn.ModuleList(
        torch.nn.Conv2d(cins[i], bcs[i], 1, bias=False) for i in range(2))
    conv_ups = torch.nn.ModuleList(
        TorchConvModule(ch + bcs[i], ch, 1) for i in range(2))
    conv_up_input = torch.nn.Conv2d(ch, ch, 1)
    aspp_conv = TorchConvModule(cins[-1], ch, 1)
    pool_conv = torch.nn.Conv2d(cins[-1], ch, 1, bias=False)
    conv_seg = torch.nn.Conv2d(ch, NCLS, 1)
    sd = {}
    for i in range(2):
        sd[f'convs.conv{i}.weight'] = convs[i].weight
        conv_ups[i].dump(sd, f'conv_ups.conv_up{i}')
    sd['conv_up_input.weight'] = conv_up_input.weight
    sd['conv_up_input.bias'] = conv_up_input.bias
    aspp_conv.dump(sd, 'aspp_conv')
    sd['image_pool.1.conv.weight'] = pool_conv.weight
    _seg(sd, conv_seg)

    for m in (*convs, *conv_ups, conv_up_input, aspp_conv, pool_conv,
              conv_seg):
        m.eval()
    rng = np.random.RandomState(13)
    feats = [rng.randn(1, hw[0], hw[1], c).astype(np.float32)
             for hw, c in zip(((256, 280), (128, 140), (64, 70)), cins)]
    with torch.no_grad():
        xs = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        x = xs[-1]
        gate = torch.sigmoid(pool_conv(F.avg_pool2d(x, 49, (16, 20))))
        gate = F.interpolate(gate, size=x.shape[2:], mode='bilinear',
                             align_corners=False)
        y = aspp_conv(x) * gate
        y = conv_up_input(y)
        for i in (1, 0):
            y = F.interpolate(y, size=xs[i].shape[2:], mode='bilinear',
                              align_corners=False)
            y = conv_ups[i](torch.cat([y, convs[i](xs[i])], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='LRASPPHead', in_channels=cins, channels=ch,
                      branch_channels=bcs, num_classes=NCLS,
                      in_index=(0, 1, 2), dropout_ratio=0),
                 convert_lraspp_head, _np_sd(sd), feats)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TorchOCRHead(torch.nn.Module):
    """mmseg OCRHead oracle (ocr_head.py:85-130 + SpatialGatherModule +
    ObjectAttentionBlock on utils/self_attention_block.py)."""

    def __init__(self, cin, ch, ocr, ncls, scale=1):
        super().__init__()
        self.scale, self.ocr = scale, ocr
        self.bottleneck = TorchConvModule(cin, ch, 3)
        self.query_project = torch.nn.ModuleList(
            [TorchConvModule(ch, ocr, 1), TorchConvModule(ocr, ocr, 1)])
        self.key_project = torch.nn.ModuleList(
            [TorchConvModule(ch, ocr, 1), TorchConvModule(ocr, ocr, 1)])
        self.value_project = TorchConvModule(ch, ocr, 1)
        self.out_project = TorchConvModule(ocr, ch, 1)
        self.ocb_bottleneck = TorchConvModule(2 * ch, ch, 1)
        self.conv_seg = torch.nn.Conv2d(ch, ncls, 1)

    def forward(self, x, prev):
        x = self.bottleneck(x)
        b, c, h, w = x.shape
        k = prev.shape[1]
        probs = F.softmax(self.scale * prev.reshape(b, k, -1), dim=2)
        ctx = torch.matmul(probs, x.reshape(b, c, -1).permute(0, 2, 1))
        ctx = ctx.permute(0, 2, 1).reshape(b, c, k, 1)
        q = x
        for m in self.query_project:
            q = m(q)
        kk = ctx
        for m in self.key_project:
            kk = m(kk)
        v = self.value_project(ctx)
        q = q.reshape(b, self.ocr, -1).permute(0, 2, 1)
        kk = kk.reshape(b, self.ocr, -1)
        v = v.reshape(b, self.ocr, -1).permute(0, 2, 1)
        sim = F.softmax(self.ocr ** -0.5 * torch.matmul(q, kk), dim=-1)
        o = torch.matmul(sim, v).permute(0, 2, 1).reshape(
            b, self.ocr, h, w)
        o = self.out_project(o)
        y = self.ocb_bottleneck(torch.cat([o, x], 1))
        return self.conv_seg(y)

    def dump(self, sd, prefix=''):
        self.bottleneck.dump(sd, prefix + 'bottleneck')
        for i, m in enumerate(self.query_project):
            m.dump(sd, prefix + f'object_context_block.query_project.{i}')
        for i, m in enumerate(self.key_project):
            m.dump(sd, prefix + f'object_context_block.key_project.{i}')
        self.value_project.dump(
            sd, prefix + 'object_context_block.value_project')
        self.out_project.dump(
            sd, prefix + 'object_context_block.out_project')
        self.ocb_bottleneck.dump(
            sd, prefix + 'object_context_block.bottleneck')
        _seg(sd, self.conv_seg, prefix + 'conv_seg')


def test_ocr_head_ingestion_parity():
    torch.manual_seed(5)
    cin, ocr = 12, 4
    oracle = TorchOCRHead(cin, CH, ocr, NCLS).eval()
    sd = {}
    oracle.dump(sd)

    rng = np.random.RandomState(5)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    prev = rng.randn(2, 10, 10, NCLS).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(feat).permute(0, 3, 1, 2),
                     torch.from_numpy(prev).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()

    head = build_head(dict(type='OCRHead', in_channels=cin, channels=CH,
                           ocr_channels=ocr, num_classes=NCLS, in_index=0,
                           dropout_ratio=0))
    inputs = [jnp.asarray(feat), jnp.asarray(prev)]
    variables = head.init(jax.random.PRNGKey(0), inputs, train=False)
    p, bs = convert_ocr_head(_np_sd(sd))
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = np.asarray(head.apply(variables, inputs, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_cascade_checkpoint_dispatch():
    """convert_mmseg_checkpoint maps decode_head.{i}. (cascade) onto
    cascade_heads_{i} with per-layout head detection."""
    from s4former_tpu.core.checkpoint import convert_mmseg_checkpoint
    torch.manual_seed(6)
    cin, ocr = 12, 4
    sd = {}
    fcn = TorchConvModule(cin, CH, 3)
    fcn.dump(sd, 'decode_head.0.convs.0')
    fseg = torch.nn.Conv2d(CH, NCLS, 1)
    _seg(sd, fseg, 'decode_head.0.conv_seg')
    TorchOCRHead(cin, CH, ocr, NCLS).dump(sd, 'decode_head.1.')
    out = convert_mmseg_checkpoint(_np_sd(sd))
    assert set(out['params']) == {'cascade_heads_0', 'cascade_heads_1'}
    assert 'convs_0' in out['params']['cascade_heads_0']
    assert 'ocb_bottleneck' in out['params']['cascade_heads_1']
    np.testing.assert_allclose(
        out['params']['cascade_heads_1']['ocb_value']['conv']['kernel'],
        np.transpose(sd['decode_head.1.object_context_block.'
                        'value_project.conv.weight'].detach().numpy(),
                     (2, 3, 1, 0)))


def test_mla_neck_and_head_ingestion_parity():
    """SETR-MLA pipeline (mla_neck.py:8-117 + setr_mla_head.py:12-63):
    token LNs -> biased 1x1 projections -> deepest-first cumulative sums
    -> biased 3x3 extracts; head = two 3x3 ConvModules + 4x upsample per
    level, concat, conv_seg."""
    from s4former_tpu.core.checkpoint import (convert_mla_neck,
                                              convert_setr_mla_head)
    from s4former_tpu.registry import NECKS
    torch.manual_seed(11)
    cin, ch, mla = 12, 8, 4
    n = 4
    norms = torch.nn.ModuleList(torch.nn.LayerNorm(cin, eps=1e-6)
                                for _ in range(n))
    for m in norms:
        with torch.no_grad():
            m.weight.normal_(1, 0.2)
            m.bias.normal_(0, 0.2)
    projs = torch.nn.ModuleList(torch.nn.Conv2d(cin, ch, 1)
                                for _ in range(n))
    feats_c = torch.nn.ModuleList(torch.nn.Conv2d(ch, ch, 3, padding=1)
                                  for _ in range(n))
    ups = torch.nn.ModuleList()
    for _ in range(n):
        ups.append(torch.nn.ModuleList([TorchConvModule(ch, mla, 3),
                                        TorchConvModule(mla, mla, 3)]))
    conv_seg = torch.nn.Conv2d(n * mla, NCLS, 1)

    sd_neck, sd_head = {}, {}
    for i in range(n):
        sd_neck[f'norm.{i}.weight'] = norms[i].weight
        sd_neck[f'norm.{i}.bias'] = norms[i].bias
        sd_neck[f'mla.channel_proj.{i}.conv.weight'] = projs[i].weight
        sd_neck[f'mla.channel_proj.{i}.conv.bias'] = projs[i].bias
        sd_neck[f'mla.feat_extract.{i}.conv.weight'] = feats_c[i].weight
        sd_neck[f'mla.feat_extract.{i}.conv.bias'] = feats_c[i].bias
        ups[i][0].dump(sd_head, f'up_convs.{i}.0')
        ups[i][1].dump(sd_head, f'up_convs.{i}.1')
    _seg(sd_head, conv_seg)

    for m in (*norms, *projs, *feats_c, conv_seg):
        m.eval()
    for pair in ups:
        pair[0].eval()
        pair[1].eval()

    rng = np.random.RandomState(11)
    xs_np = [rng.randn(2, 8, 8, cin).astype(np.float32)
             for _ in range(n)]
    with torch.no_grad():
        feats = []
        for i, x in enumerate(xs_np):
            t = torch.from_numpy(x)                      # NHWC
            t = norms[i](t).permute(0, 3, 1, 2)          # LN over C
            feats.append(projs[i](t))
        rev = feats[::-1]
        mids = [rev[0]]
        for f in rev[1:]:
            mids.append(mids[-1] + f)
        outs = [feats_c[k](m) for k, m in enumerate(mids)]
        branches = []
        for i, o in enumerate(outs):
            y = ups[i][1](ups[i][0](o))
            y = F.interpolate(y, scale_factor=4, mode='bilinear',
                              align_corners=False)
            branches.append(y)
        ref = conv_seg(torch.cat(branches, 1)).permute(0, 2, 3, 1).numpy()

    neck = NECKS.build(dict(type='MLANeck', in_channels=[cin] * n,
                            out_channels=ch))
    jf = [jnp.asarray(x) for x in xs_np]
    nv = neck.init(jax.random.PRNGKey(0), jf)
    np_, _ = convert_mla_neck(_np_sd(sd_neck))
    nv = merge_pretrained(nv, {'params': np_}, strict=True)
    neck_outs = neck.apply(nv, jf)

    head = build_head(dict(type='SETRMLAHead', in_channels=[ch] * n,
                           channels=n * mla, mla_channels=mla,
                           num_classes=NCLS, up_scale=4,
                           in_index=(0, 1, 2, 3), dropout_ratio=0))
    hv = head.init(jax.random.PRNGKey(0), list(neck_outs), train=False)
    hp, hb = convert_setr_mla_head(_np_sd(sd_head))
    hv = merge_pretrained(hv, {'params': hp, 'batch_stats': hb},
                          strict=True)
    got = np.asarray(head.apply(hv, list(neck_outs), train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TorchCCA(torch.nn.Module):
    """mmcv ops/cc_attention.py torch implementation (biased 1x1 convs,
    Scale(0.) gamma, -inf diagonal on the column energies)."""

    def __init__(self, c):
        super().__init__()
        self.query_conv = torch.nn.Conv2d(c, c // 8, 1)
        self.key_conv = torch.nn.Conv2d(c, c // 8, 1)
        self.value_conv = torch.nn.Conv2d(c, c, 1)
        self.gamma = torch.nn.Parameter(torch.tensor(0.7))

    def forward(self, x):
        b, c, h, w = x.shape
        q = self.query_conv(x)
        k = self.key_conv(x)
        v = self.value_conv(x)
        energy_h = torch.einsum('bchw,bciw->bwhi', q, k) + \
            torch.diag(torch.full((h,), float('-inf')))
        energy_h = energy_h.transpose(1, 2)            # [B,H,W,H]
        energy_w = torch.einsum('bchw,bchj->bhwj', q, k)
        attn = F.softmax(torch.cat([energy_h, energy_w], dim=-1), dim=-1)
        out = torch.einsum('bciw,bhwi->bchw', v, attn[..., :h])
        out = out + torch.einsum('bchj,bhwj->bchw', v, attn[..., h:])
        return self.gamma * out + x

    def dump(self, sd, pre):
        for name, m in (('query', self.query_conv), ('key', self.key_conv),
                        ('value', self.value_conv)):
            sd[pre + f'{name}_conv.weight'] = m.weight
            sd[pre + f'{name}_conv.bias'] = m.bias
        sd[pre + 'gamma.scale'] = self.gamma


def test_cc_head_ingestion_parity():
    """CCHead (cc_head.py): FCN convs with recurrence=2 criss-cross
    attention between them."""
    from s4former_tpu.core.checkpoint import convert_cc_head
    torch.manual_seed(10)
    cin, ch = 12, 8
    convs = torch.nn.ModuleList([TorchConvModule(cin, ch, 3),
                                 TorchConvModule(ch, ch, 3)])
    cca = TorchCCA(ch)
    conv_cat = TorchConvModule(cin + ch, ch, 3)
    conv_seg = torch.nn.Conv2d(ch, NCLS, 1)
    sd = {}
    for i, m in enumerate(convs):
        m.dump(sd, f'convs.{i}')
    cca.dump(sd, 'cca.')
    conv_cat.dump(sd, 'conv_cat')
    _seg(sd, conv_seg)

    for m in (*convs, cca, conv_cat, conv_seg):
        m.eval()
    rng = np.random.RandomState(10)
    feat = rng.randn(2, 9, 7, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        y = convs[0](x)
        for _ in range(2):
            y = cca(y)
        y = convs[1](y)
        y = conv_cat(torch.cat([x, y], 1))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='CCHead', in_channels=cin, channels=ch,
                      num_classes=NCLS, recurrence=2, concat_input=True,
                      in_index=0, dropout_ratio=0),
                 convert_cc_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TorchEncLayer(torch.nn.Module):
    """mmcv TransformerEncoderLayer (vit.py:67-127): pre-LN + MHA + FFN."""

    def __init__(self, c, heads, eps=1e-5):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(c, eps=eps)
        self.attn = torch.nn.MultiheadAttention(c, heads, batch_first=True)
        self.ln2 = torch.nn.LayerNorm(c, eps=eps)
        self.fc1 = torch.nn.Linear(c, 4 * c)
        self.fc2 = torch.nn.Linear(4 * c, c)

    def forward(self, x):
        y = self.ln1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        z = self.ln2(x)
        return x + self.fc2(F.gelu(self.fc1(z)))

    def dump(self, sd, pre):
        for n, m in (('ln1', self.ln1), ('ln2', self.ln2)):
            sd[pre + n + '.weight'] = m.weight
            sd[pre + n + '.bias'] = m.bias
        sd[pre + 'attn.attn.in_proj_weight'] = self.attn.in_proj_weight
        sd[pre + 'attn.attn.in_proj_bias'] = self.attn.in_proj_bias
        sd[pre + 'attn.attn.out_proj.weight'] = self.attn.out_proj.weight
        sd[pre + 'attn.attn.out_proj.bias'] = self.attn.out_proj.bias
        sd[pre + 'ffn.layers.0.0.weight'] = self.fc1.weight
        sd[pre + 'ffn.layers.0.0.bias'] = self.fc1.bias
        sd[pre + 'ffn.layers.1.weight'] = self.fc2.weight
        sd[pre + 'ffn.layers.1.bias'] = self.fc2.bias


def test_segmenter_mask_head_ingestion_parity():
    """SegmenterMaskTransformerHead (segmenter_mask_head.py:85-131)."""
    from s4former_tpu.core.checkpoint import convert_segmenter_mask_head
    torch.manual_seed(9)
    cin, dim, heads = 12, 16, 2
    dec_proj = torch.nn.Linear(cin, dim)
    cls_emb = torch.randn(1, NCLS, dim)
    layers = torch.nn.ModuleList(TorchEncLayer(dim, heads)
                                 for _ in range(2))
    patch_proj = torch.nn.Linear(dim, dim, bias=False)
    classes_proj = torch.nn.Linear(dim, dim, bias=False)
    decoder_norm = torch.nn.LayerNorm(dim)
    mask_norm = torch.nn.LayerNorm(NCLS)
    sd = {'dec_proj.weight': dec_proj.weight,
          'dec_proj.bias': dec_proj.bias,
          'cls_emb': cls_emb,
          'patch_proj.weight': patch_proj.weight,
          'classes_proj.weight': classes_proj.weight,
          'decoder_norm.weight': decoder_norm.weight,
          'decoder_norm.bias': decoder_norm.bias,
          'mask_norm.weight': mask_norm.weight,
          'mask_norm.bias': mask_norm.bias}
    for i, m in enumerate(layers):
        m.dump(sd, f'layers.{i}.')

    rng = np.random.RandomState(9)
    feat = rng.randn(2, 8, 8, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).reshape(2, 64, cin)
        x = dec_proj(x)
        x = torch.cat([x, cls_emb.expand(2, -1, -1)], 1)
        for m in layers:
            x = m(x)
        x = decoder_norm(x)
        patches = F.normalize(patch_proj(x[:, :-NCLS]), dim=2, p=2)
        cls_feat = F.normalize(classes_proj(x[:, -NCLS:]), dim=2, p=2)
        masks = mask_norm(patches @ cls_feat.transpose(1, 2))
        ref = masks.reshape(2, 8, 8, NCLS).numpy()

    got = _apply(dict(type='SegmenterMaskTransformerHead', in_channels=cin,
                      num_layers=2, num_heads=heads, embed_dims=dim,
                      num_classes=NCLS, in_index=0, dropout_ratio=0),
                 convert_segmenter_mask_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TorchSepConvModule(torch.nn.Module):
    """mmcv DepthwiseSeparableConvModule: depthwise ConvModule then
    pointwise ConvModule (each conv-no-bias + BN + ReLU)."""

    def __init__(self, cin, cout, k=3, dilation=1):
        super().__init__()
        self.depthwise_conv = TorchConvModule(cin, cin, k, dilation)
        self.depthwise_conv.conv.groups = cin
        # re-create the conv with groups (Conv2d groups is fixed at init)
        self.depthwise_conv.conv = torch.nn.Conv2d(
            cin, cin, k, padding=dilation * (k - 1) // 2,
            dilation=dilation, groups=cin, bias=False)
        self.pointwise_conv = TorchConvModule(cin, cout, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))

    def dump(self, sd, key):
        self.depthwise_conv.dump(sd, key + '.depthwise_conv')
        self.pointwise_conv.dump(sd, key + '.pointwise_conv')


def _torch_aspp_outs(x, image_pool, branches, align=False):
    pooled = image_pool(F.adaptive_avg_pool2d(x, 1))
    outs = [F.interpolate(pooled, size=x.shape[2:], mode='bilinear',
                          align_corners=align)]
    outs.extend(m(x) for m in branches)
    return torch.cat(outs, 1)


def test_aspp_head_ingestion_parity():
    torch.manual_seed(3)
    cin, dilations = 12, (1, 2, 3)
    image_pool = TorchConvModule(cin, CH, 1)
    branches = torch.nn.ModuleList(
        TorchConvModule(cin, CH, 1 if d == 1 else 3, d)
        for d in dilations)
    bottleneck = TorchConvModule((len(dilations) + 1) * CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    image_pool.dump(sd, 'image_pool.1')
    for i, m in enumerate(branches):
        m.dump(sd, f'aspp_modules.{i}')
    bottleneck.dump(sd, 'bottleneck')
    _seg(sd, conv_seg)

    for m in (image_pool, *branches, bottleneck, conv_seg):
        m.eval()
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        y = bottleneck(_torch_aspp_outs(x, image_pool, branches))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='ASPPHead', in_channels=cin, channels=CH,
                      num_classes=NCLS, dilations=dilations, in_index=0,
                      dropout_ratio=0),
                 convert_aspp_head, _np_sd(sd), [feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sep_aspp_head_ingestion_parity():
    """DeepLabV3+ head (sep_aspp_head.py:30-109): DS aspp branches for
    dilation>1, c1 low-level fusion, two-stage sep_bottleneck."""
    torch.manual_seed(4)
    cin, c1_in, c1_ch, dilations = 12, 6, 4, (1, 2, 3)
    image_pool = TorchConvModule(cin, CH, 1)
    branches = torch.nn.ModuleList(
        TorchConvModule(cin, CH, 1) if d == 1 else
        TorchSepConvModule(cin, CH, 3, d) for d in dilations)
    bottleneck = TorchConvModule((len(dilations) + 1) * CH, CH, 3)
    c1_bottleneck = TorchConvModule(c1_in, c1_ch, 1)
    sep0 = TorchSepConvModule(CH + c1_ch, CH, 3)
    sep1 = TorchSepConvModule(CH, CH, 3)
    conv_seg = torch.nn.Conv2d(CH, NCLS, 1)
    sd = {}
    image_pool.dump(sd, 'image_pool.1')
    for i, m in enumerate(branches):
        m.dump(sd, f'aspp_modules.{i}')
    bottleneck.dump(sd, 'bottleneck')
    c1_bottleneck.dump(sd, 'c1_bottleneck')
    sep0.dump(sd, 'sep_bottleneck.0')
    sep1.dump(sd, 'sep_bottleneck.1')
    _seg(sd, conv_seg)

    for m in (image_pool, *branches, bottleneck, c1_bottleneck, sep0,
              sep1, conv_seg):
        m.eval()
    rng = np.random.RandomState(4)
    c1_feat = rng.randn(2, 20, 20, c1_in).astype(np.float32)
    feat = rng.randn(2, 10, 10, cin).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(feat).permute(0, 3, 1, 2)
        c1x = torch.from_numpy(c1_feat).permute(0, 3, 1, 2)
        y = bottleneck(_torch_aspp_outs(x, image_pool, branches))
        c1 = c1_bottleneck(c1x)
        y = F.interpolate(y, size=c1.shape[2:], mode='bilinear',
                          align_corners=False)
        y = sep1(sep0(torch.cat([y, c1], 1)))
        ref = conv_seg(y).permute(0, 2, 3, 1).numpy()

    got = _apply(dict(type='DepthwiseSeparableASPPHead', in_channels=cin,
                      channels=CH, num_classes=NCLS, dilations=dilations,
                      c1_in_channels=c1_in, c1_channels=c1_ch,
                      in_index=-1, dropout_ratio=0),
                 convert_aspp_head, _np_sd(sd), [c1_feat, feat])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_point_head_ingestion_parity():
    """PointRend PointHead MLP (point_head.py:92-130: Conv1d fcs with
    coarse re-concat each layer, fc_seg classifier) vs converted weights
    through our Dense-layout PointHead._mlp."""
    from s4former_tpu.core.checkpoint import convert_point_head
    from s4former_tpu.models.decode_heads.advanced_heads import PointHead

    torch.manual_seed(11)
    num_fcs, cin = 3, 6
    sd, fcs = {}, []
    fc_in = cin + NCLS
    for k in range(num_fcs):
        conv = torch.nn.Conv1d(fc_in, CH, 1)
        fcs.append(conv)
        sd[f'fcs.{k}.conv.weight'] = conv.weight
        sd[f'fcs.{k}.conv.bias'] = conv.bias
        fc_in = CH + NCLS
    fc_seg = torch.nn.Conv1d(fc_in, NCLS, 1)
    sd['fc_seg.weight'] = fc_seg.weight
    sd['fc_seg.bias'] = fc_seg.bias

    fine = torch.randn(2, cin, 37)
    coarse = torch.randn(2, NCLS, 37)
    with torch.no_grad():
        x = torch.cat([fine, coarse], 1)
        for conv in fcs:
            x = torch.cat([F.relu(conv(x)), coarse], 1)
        ref = fc_seg(x).permute(0, 2, 1).numpy()

    # Drive the cascade train path with pixel-center coords on a 1xP
    # feature map: bilinear point_sample at centers is exact, so the MLP
    # sees the torch oracle's inputs verbatim.
    head = PointHead(in_channels=(cin,), channels=CH, num_classes=NCLS)
    npts = fine.shape[-1]
    fine_map = jnp.asarray(fine.numpy().transpose(0, 2, 1)[:, None])
    prev_logits = jnp.asarray(coarse.numpy().transpose(0, 2, 1)[:, None])
    xs = (np.arange(npts, dtype=np.float32) + 0.5) / npts
    points = jnp.asarray(np.broadcast_to(
        np.stack([xs, np.full_like(xs, 0.5)], -1), (2, npts, 2)).copy())
    variables = head.init(jax.random.PRNGKey(0), [fine_map, prev_logits],
                          points=points)
    p, _ = convert_point_head(_np_sd(sd))
    variables = merge_pretrained(variables, {'params': p}, strict=True)
    got = head.apply(variables, [fine_map, prev_logits], points=points)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
