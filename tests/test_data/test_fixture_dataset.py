"""The committed real-image fixture dataset must flow through the REAL
config pipelines (the same ones the flagship fixture run uses) — guards
the data/fixtures/voc_mini wiring that backs the end-to-end learning
evidence."""
import os.path as osp

import numpy as np
import pytest

import s4former_tpu.data  # noqa: F401
from s4former_tpu.config import Config
from s4former_tpu.data.datasets.custom import build_dataset

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
CFG = osp.join(REPO, 'configs/setr/setr_fixture_voc_mini_fullflag.py')


@pytest.fixture(scope='module')
def cfg():
    c = Config.fromfile(CFG)
    # data_root in the config is repo-relative
    for d in (c.data['train']['sup'], c.data['train']['unsup'],
              c.data['val']):
        d['data_root'] = osp.join(REPO, d['data_root'])
    return c


def test_fixture_sup_item_real_photo(cfg):
    ds = build_dataset(cfg.data['train']['sup'])
    assert len(ds) == 16
    item = ds[0]
    img = np.asarray(item['img'])
    gt = np.asarray(item['gt_semantic_seg'])
    assert img.shape == (512, 512, 3)
    assert gt.shape == (512, 512)
    # normalized real photo: non-constant, finite
    assert np.isfinite(img).all()
    assert img.std() > 0.1
    valid = gt[gt != 255]
    assert valid.size > 0 and valid.max() <= 20


def test_fixture_unsup_item_is_multibranch(cfg):
    ds = build_dataset(cfg.data['train']['unsup'])
    item = ds[0]
    assert isinstance(item, list) and len(item) == 2
    tags = sorted(b['tag'] for b in item)
    assert tags == ['unsup_student', 'unsup_teacher']
    # both branches share geometry (same crop), differ photometrically
    s = np.asarray(item[0]['img'])
    t = np.asarray(item[1]['img'])
    assert s.shape == t.shape == (512, 512, 3)


def test_fixture_val_item_and_gt(cfg):
    ds = build_dataset(cfg.data['val'])
    assert len(ds) == 16
    gt = ds.get_gt_seg_map(0)
    assert gt.shape == (375, 500)
    assert set(np.unique(gt)) <= set(range(21)) | {255}
