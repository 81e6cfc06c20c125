"""Config smoke tests: load every shipped config and build the model
(reference: tests/test_config.py:27,63 — which would fail on the broken
segformer config there; ours must all build)."""
import glob
import os.path as osp

import jax
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.config import Config
from s4former_tpu.models import build_segmentor
from s4former_tpu.semi.config import SemiConfig

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(osp.join(REPO, 'configs', '*', '*.py'))
    if '_base_' not in p)


def test_configs_exist():
    assert len(CONFIGS) >= 5


@pytest.mark.parametrize('path', CONFIGS, ids=lambda p: osp.basename(p))
def test_config_builds_model(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg
    model = build_segmentor(cfg.model)
    assert model.num_classes in (19, 21, 150)
    semi = SemiConfig.from_model_cfg(cfg.model)
    assert 0.0 <= semi.unsup_confidence <= 1.0


def test_s4former_config_flags():
    path = osp.join(
        REPO, 'configs', 'setr',
        'setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_'
        'semi_beta_1_th_0.95_MT_w_ours.py')
    cfg = Config.fromfile(path)
    semi = SemiConfig.from_model_cfg(cfg.model)
    # the exact paper configuration (reference ..._MT_w_ours.py:236-257)
    assert semi.ema and semi.ema_momentum == 0.999
    assert semi.unsup_weight == 1.0
    assert semi.unsup_confidence == 0.95
    assert semi.attn_mask_seperate_head
    assert semi.attn_mask_weight == 5
    assert semi.adaptive_attn_mask
    assert semi.use_PatchShuffle_w_Cutmix
    assert semi.PatchMix_N == 8
    assert semi.negative_class_ranking
    assert semi.negative_class_ranking_mode == 'unsup_only'
    assert cfg.optimizer.lr == 0.001
    assert cfg.optimizer.weight_decay == 0.0
    assert cfg.optimizer.paramwise_cfg.custom_keys['head']['lr_mult'] == 10.
    assert cfg.runner.max_iters == 80001
    # model arch (":145-175")
    assert cfg.model.backbone.embed_dims == 768
    assert tuple(cfg.model.backbone.out_indices) == (4, 7, 9, 11)
    assert cfg.model.decode_head.num_convs == 4
    assert cfg.model.decode_head.up_scale == 2
    assert len(cfg.model.auxiliary_head) == 4


def test_sup_config_has_no_unsup_stream():
    path = osp.join(
        REPO, 'configs', 'setr',
        'setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_'
        'classic_sup.py')
    cfg = Config.fromfile(path)
    assert cfg.data.train.get('unsup') is None
    semi = SemiConfig.from_model_cfg(cfg.model)
    assert not semi.ema
