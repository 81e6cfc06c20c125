"""Shape tests for the CNN backbone zoo (SURVEY.md §4 strategy)."""
import jax
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.registry import BACKBONES

B, HW = 1, 64


def _run(cfg, hw=HW):
    bb = BACKBONES.build(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, 3))
    v = bb.init({'params': jax.random.PRNGKey(1)}, x)
    outs = bb.apply(v, x, train=False)
    assert isinstance(outs, tuple) and len(outs) >= 1
    for o in outs:
        assert o.ndim == 4 and o.shape[0] == B
        assert np.isfinite(np.asarray(o)).all()
    return outs


def test_resnext():
    outs = _run(dict(type='ResNeXt', depth=50, groups=4, base_width=4,
                     out_indices=(2, 3)))
    assert outs[0].shape == (B, 4, 4, 1024)
    assert outs[1].shape == (B, 2, 2, 2048)


def test_resnest():
    outs = _run(dict(type='ResNeSt', depth=50, radix=2, out_indices=(3,),
                     deep_stem=True))
    assert outs[0].shape == (B, 2, 2, 2048)


def test_bisenetv1():
    outs = _run(dict(type='BiSeNetV1',
                     backbone_cfg=dict(type='ResNet', depth=18,
                                       out_indices=(2, 3)),
                     context_channels=(32, 64, 128), out_channels=64,
                     spatial_channels=(16, 16, 16, 32)))
    assert outs[0].shape[1:3] == (8, 8)      # 1/8 fused
    assert outs[0].shape[-1] == 64


def test_bisenetv2():
    # ref BGA invariant: semantic[-1] == detail[-1] == bga_channels
    # (bisenetv2.py:454-521 projects both branches from out_channels)
    outs = _run(dict(type='BiSeNetV2', detail_channels=(8, 8, 16),
                     semantic_channels=(4, 8, 16, 16), bga_channels=16))
    assert outs[0].shape[1:3] == (8, 8)      # BGA at 1/8
    assert len(outs) == 5                    # + 4 semantic aux taps


def test_stdc_context_path():
    outs = _run(dict(type='STDCContextPathNet',
                     backbone_cfg=dict(type='STDCNet',
                                       channels=(8, 8, 16, 32, 64)),
                     out_channels=16, ffn_channels=32))
    assert len(outs) == 4
    assert outs[0].shape[1:3] == (8, 8)      # FFM at 1/8


def test_fast_scnn():
    outs = _run(dict(type='FastSCNN', downsample_dw_channels=(8, 12),
                     global_in_channels=16,
                     global_block_channels=(16, 24, 32),
                     global_out_channels=32, fusion_out_channels=32))
    higher, lower, fusion = outs
    assert higher.shape[1:3] == (8, 8)
    assert lower.shape[1:3] == (2, 2)
    assert fusion.shape[1:3] == (8, 8)


def test_cgnet():
    outs = _run(dict(type='CGNet', num_channels=(8, 16, 32),
                     num_blocks=(2, 3)))
    assert len(outs) == 3
    # stage channels: stem cat input, stage1 cat input, stage2
    assert outs[0].shape[1:3] == (32, 32)
    assert outs[1].shape[1:3] == (16, 16)
    assert outs[2].shape[1:3] == (8, 8)


def test_erfnet():
    outs = _run(dict(type='ERFNet', enc_downsample_channels=(8, 16, 32),
                     enc_stage_non_bottlenecks=(2, 2),
                     dec_upsample_channels=(16, 8),
                     dec_stages_non_bottleneck=(1, 1)))
    assert outs[0].shape[1:3] == (32, 32)    # decoder at 1/2


def test_icnet():
    outs = _run(dict(type='ICNet',
                     backbone_cfg=dict(type='ResNetV1c', depth=18,
                                       out_indices=(1, 3)),
                     layer_channels=(128, 512),
                     psp_out_channels=32, out_channels=(8, 16, 16)))
    s1, s2, s4 = outs
    assert s1.shape[1:3] == (8, 8)
    assert s1.shape[-1] == 8 and s2.shape[-1] == 16 and s4.shape[-1] == 16


def test_timm_backbone_raises():
    with pytest.raises(ImportError, match='timm'):
        BACKBONES.build(dict(type='TIMMBackbone', model_name='resnet18'))


def test_semi_kwargs_accepted():
    """CNN backbones run under the semi segmentor: the PASA/fdrop kwargs
    are accepted and ignored (reference resnet.py:663-665 pattern)."""
    bb = BACKBONES.build(dict(type='FastSCNN',
                              downsample_dw_channels=(8, 12),
                              global_in_channels=16,
                              global_block_channels=(16, 24, 32),
                              global_out_channels=32,
                              fusion_out_channels=32))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, 3))
    v = bb.init({'params': jax.random.PRNGKey(1)}, x)
    outs = bb.apply(v, x, train=False, attn_bias=None, pos_mode='default',
                    use_fdrop=False)
    assert len(outs) == 3


def test_twins_pcpvt():
    outs = _run(dict(type='PCPVT', embed_dims=(8, 16, 32, 32),
                     num_heads=(1, 2, 4, 4), mlp_ratios=(2, 2, 2, 2),
                     depths=(1, 1, 1, 1), sr_ratios=(4, 2, 2, 1)))
    assert len(outs) == 4
    assert outs[0].shape == (B, 16, 16, 8)
    assert outs[3].shape == (B, 2, 2, 32)


def test_twins_svt_windows():
    outs = _run(dict(type='SVT', embed_dims=(8, 16, 32, 32),
                     num_heads=(1, 2, 4, 4), mlp_ratios=(2, 2, 2, 2),
                     depths=(2, 2, 2, 2), sr_ratios=(4, 2, 2, 1),
                     windows=(4, 4, 4, 4), out_indices=(2, 3)))
    assert outs[0].shape == (B, 4, 4, 32)
