"""Config smoke tests (reference test strategy: tests/test_config.py:27
builds the model from every shipped config). Every config under configs/
must load through the `_base_` machinery and build a segmentor object;
the zoo base-model configs additionally run a tiny forward."""
import glob
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.config import Config
from s4former_tpu.models import build_segmentor

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ALL_CONFIGS = sorted(
    glob.glob(osp.join(REPO, 'configs', '**', '*.py'), recursive=True))
MODEL_BASES = sorted(
    glob.glob(osp.join(REPO, 'configs', '_base_', 'models', '*.py')))


@pytest.mark.parametrize(
    'path', ALL_CONFIGS, ids=[osp.relpath(p, REPO) for p in ALL_CONFIGS])
def test_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    if 'model' not in cfg:
        pytest.skip('fragment without model (dataset/schedule/runtime)')
    model = build_segmentor(cfg.model)
    assert model is not None


# tiny-forward smoke on a representative subset of base models: build,
# init, and run a 64x64 forward (CPU); pins the in_channels/in_index
# wiring of each config against the real modules.
FWD = ['fpn_r50.py', 'ccnet_r50-d8.py', 'segmenter_vit-b_mask.py',
       'bisenetv2.py', 'ocrnet_hr18.py']


@pytest.mark.parametrize('name', FWD)
def test_base_model_tiny_forward(name):
    path = osp.join(REPO, 'configs', '_base_', 'models', name)
    cfg = Config.fromfile(path)
    mc = dict(cfg.model)
    # shrink ViT-scale models so CPU init stays fast
    if name.startswith('segmenter'):
        mc['backbone'] = dict(mc['backbone'], img_size=(64, 64),
                              embed_dims=64, num_layers=2, num_heads=4)
        mc['decode_head'] = dict(mc['decode_head'], in_channels=64,
                                 embed_dims=64, num_heads=4, num_layers=1,
                                 channels=64)
    model = build_segmentor(mc)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                      jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        img, train=False)
    out = model.apply(variables, img, train=False)
    assert out.shape[0] == 1 and out.shape[-1] == 19
    assert np.isfinite(np.asarray(out)).all()


def test_semi_dataset_configs_emit_unsup_branches():
    """Regression: the semi dataset configs MUST route the unsup source
    through MultiBranch with unsup_student/unsup_teacher tags — a
    sup-tagged unsup pipeline silently stacks unlabeled images (and their
    GT!) into the supervised batch and the semi branch never runs."""
    for name in ('pascal_voc12_aug_1over16_split_classic_semi.py',
                 'cityscapes_768x768_1over16_split_CPS_semi.py'):
        cfg = Config.fromfile(
            osp.join(REPO, 'configs', '_base_', 'datasets', name))
        unsup_pipe = cfg.data['train']['unsup']['pipeline']
        mb = [t for t in unsup_pipe if t['type'] == 'MultiBranch']
        assert len(mb) == 1, name
        branches = {k: v for k, v in mb[0].items() if k != 'type'}
        assert set(branches) == {'unsup_student', 'unsup_teacher'}, name
        for bname, bpipe in branches.items():
            tags = [t['tag'] for t in bpipe if t['type'] == 'ExtraAttrs']
            assert tags == [bname], (name, bname)
        # and the sup pipeline stays sup-tagged
        sup_tags = [t['tag'] for t in cfg.data['train']['sup']['pipeline']
                    if t['type'] == 'ExtraAttrs']
        assert sup_tags == ['sup'], name
