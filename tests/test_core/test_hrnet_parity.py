"""HRNet checkpoint-ingestion parity vs a torch oracle.

The oracle mirrors the reference module-for-module
(mmseg/models/backbones/hrnet.py:14-214 HRModule, :376-568 HRNet):
two-conv stem, Bottleneck layer1, per-stage transitions (channel-fix /
new-branch-from-last chains), HRModules with per-branch ResNet blocks
and full cross-resolution fusion (1x1+BN+bilinear-up for j>i, stride-2
conv chains with ReLU on intermediates only for j<i, ReLU on the sum),
and emits the mmseg state_dict key layout that
``convert_hrnet_backbone`` ingests. Reuses the ResNet torch blocks
already pinned against our flax blocks in test_beit_resnet_parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from tests.test_core.test_beit_resnet_parity import (TorchBasicBlock,
                                                     TorchBottleneck,
                                                     TorchConvBN)

EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(2,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(2, 2), num_channels=(8, 16)),
    stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                num_blocks=(2, 2, 2), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)),
)
_BLOCKS_T = {'BASIC': (TorchBasicBlock, 1), 'BOTTLENECK': (TorchBottleneck, 4)}


class TorchHRNet(torch.nn.Module):
    def __init__(self, extra):
        super().__init__()
        torch.manual_seed(7)
        self.extra = extra
        self.conv1 = TorchConvBN(3, 64, 3, 2)
        self.conv2 = TorchConvBN(64, 64, 3, 2)
        s1 = extra['stage1']
        blk, exp = _BLOCKS_T[s1['block']]
        self.layer1 = torch.nn.ModuleList()
        cin = 64
        for k in range(s1['num_blocks'][0]):
            planes = s1['num_channels'][0]
            self.layer1.append(blk(cin, planes, 1, 1,
                                   down=(cin != planes * exp)))
            cin = planes * exp
        pre_ch = [cin]
        self.transitions = torch.nn.ModuleList()
        self.stages = torch.nn.ModuleList()
        for si in (2, 3, 4):
            cfg = extra[f'stage{si}']
            blk, exp = _BLOCKS_T[cfg['block']]
            cur_ch = [c * exp for c in cfg['num_channels']]
            trans = torch.nn.ModuleList()
            for i, c in enumerate(cur_ch):
                if i < len(pre_ch):
                    trans.append(TorchConvBN(pre_ch[i], c, 3, 1)
                                 if pre_ch[i] != c else torch.nn.Identity())
                else:
                    chain = torch.nn.ModuleList()
                    src = pre_ch[-1]
                    for j in range(i + 1 - len(pre_ch)):
                        oc = c if j == i - len(pre_ch) else src
                        chain.append(TorchConvBN(src, oc, 3, 2))
                        src = oc
                    trans.append(chain)
            self.transitions.append(trans)
            mods = torch.nn.ModuleList()
            for _ in range(cfg['num_modules']):
                branches = torch.nn.ModuleList()
                for b, c in enumerate(cfg['num_channels']):
                    bb = torch.nn.ModuleList()
                    ci = cur_ch[b]
                    for k in range(cfg['num_blocks'][b]):
                        bb.append(blk(ci, c, 1, 1, down=(ci != c * exp)))
                        ci = c * exp
                    branches.append(bb)
                fuse = torch.nn.ModuleDict()
                for i in range(len(cur_ch)):
                    for j in range(len(cur_ch)):
                        if j > i:
                            fuse[f'{i}_{j}'] = TorchConvBN(
                                cur_ch[j], cur_ch[i], 1, 1)
                        elif j < i:
                            chain = torch.nn.ModuleList()
                            for k in range(i - j):
                                last = k == i - j - 1
                                # intermediates keep SOURCE channels
                                chain.append(TorchConvBN(
                                    cur_ch[j],
                                    cur_ch[i] if last else cur_ch[j],
                                    3, 2))
                            fuse[f'{i}_{j}'] = chain
                mods.append(torch.nn.ModuleDict(
                    {'branches': branches, 'fuse': fuse}))
            self.stages.append(mods)
            pre_ch = cur_ch

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        for b in self.layer1:
            x = b(x)
        xs = [x]
        for si, (trans, mods) in enumerate(zip(self.transitions,
                                               self.stages)):
            new_xs = []
            for i, t in enumerate(trans):
                if isinstance(t, torch.nn.Identity):
                    new_xs.append(xs[i])
                elif isinstance(t, torch.nn.ModuleList):
                    y = xs[-1]
                    for m in t:
                        y = m(y)
                    new_xs.append(y)
                else:
                    new_xs.append(t(xs[i]))
            xs = new_xs
            for mod in mods:
                xs = [self._branch(mod['branches'][b], xb)
                      for b, xb in enumerate(xs)]
                fused = []
                for i in range(len(xs)):
                    acc = xs[i]
                    for j in range(len(xs)):
                        if j == i:
                            continue
                        f = mod['fuse'][f'{i}_{j}']
                        if j > i:
                            y = f(xs[j], relu=False)
                            y = F.interpolate(y, size=xs[i].shape[2:],
                                              mode='bilinear',
                                              align_corners=False)
                        else:
                            y = xs[j]
                            for k, m in enumerate(f):
                                y = m(y, relu=(k != len(f) - 1))
                        acc = acc + y
                    fused.append(F.relu(acc))
                xs = fused
        return xs

    @staticmethod
    def _branch(blocks, x):
        for b in blocks:
            x = b(x)
        return x

    def state_dict_mmseg(self):
        sd = {}

        def put(mod, conv_key, bn_key):
            sd[conv_key + '.weight'] = mod.conv.weight
            for a, b in (('weight', 'weight'), ('bias', 'bias'),
                         ('running_mean', 'running_mean'),
                         ('running_var', 'running_var')):
                sd[bn_key + '.' + a] = getattr(mod.bn, b)

        def put_block(blk, pre):
            put(blk.c1, pre + 'conv1', pre + 'bn1')
            put(blk.c2, pre + 'conv2', pre + 'bn2')
            if hasattr(blk, 'c3'):
                put(blk.c3, pre + 'conv3', pre + 'bn3')
            if blk.down is not None:
                put(blk.down, pre + 'downsample.0', pre + 'downsample.1')

        put(self.conv1, 'conv1', 'bn1')
        put(self.conv2, 'conv2', 'bn2')
        for k, b in enumerate(self.layer1):
            put_block(b, f'layer1.{k}.')
        for ti, trans in enumerate(self.transitions, start=1):
            for i, t in enumerate(trans):
                if isinstance(t, torch.nn.Identity):
                    continue
                if isinstance(t, torch.nn.ModuleList):
                    for j, m in enumerate(t):
                        put(m, f'transition{ti}.{i}.{j}.0',
                            f'transition{ti}.{i}.{j}.1')
                else:
                    put(t, f'transition{ti}.{i}.0', f'transition{ti}.{i}.1')
        for si, mods in zip((2, 3, 4), self.stages):
            for m, mod in enumerate(mods):
                for b, blocks in enumerate(mod['branches']):
                    for k, blk in enumerate(blocks):
                        put_block(blk, f'stage{si}.{m}.branches.{b}.{k}.')
                for key, f in mod['fuse'].items():
                    i, j = key.split('_')
                    base = f'stage{si}.{m}.fuse_layers.{i}.{j}'
                    if isinstance(f, torch.nn.ModuleList):
                        for k, mm in enumerate(f):
                            put(mm, f'{base}.{k}.0', f'{base}.{k}.1')
                    else:
                        put(f, f'{base}.0', f'{base}.1')
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_hrnet_ingestion_parity():
    oracle = TorchHRNet(EXTRA).eval()
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='HRNet', extra=EXTRA),
        decode_head=dict(type='FCNHead', in_channels=8, channels=8,
                         num_classes=5, in_index=0, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 64, 64, 3))
    converted = convert_mmseg_checkpoint(
        {'backbone.' + k: v for k, v in oracle.state_dict_mmseg().items()})
    variables = merge_pretrained(variables, converted, strict=True)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == 4
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'branch {s}')
