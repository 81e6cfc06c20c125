"""RepeatDataset / ConcatDataset wrappers (ref dataset_wrappers.py)."""
import os.path as osp

import numpy as np

import s4former_tpu.data  # noqa: F401
from s4former_tpu.config import Config
from s4former_tpu.data.datasets.custom import build_dataset

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
CFG = osp.join(REPO, 'configs/setr/setr_fixture_voc_mini_fullflag.py')


def _val_cfg():
    c = Config.fromfile(CFG)
    d = dict(c.data['val'])
    d['data_root'] = osp.join(REPO, d['data_root'])
    return d


def test_repeat_dataset_modulo():
    base = build_dataset(_val_cfg())
    ds = build_dataset(dict(type='RepeatDataset', times=3,
                            dataset=_val_cfg()))
    assert len(ds) == 3 * len(base)
    # val pipeline is MultiScaleFlipAug -> list of aug views
    a, b = ds[1], ds[1 + len(base)]
    if isinstance(a, list):
        a, b = a[0], b[0]
    np.testing.assert_array_equal(np.asarray(a['img']),
                                  np.asarray(b['img']))
    np.testing.assert_array_equal(ds.get_gt_seg_map(0),
                                  ds.get_gt_seg_map(len(base)))
    assert ds.CLASSES == base.CLASSES


def test_concat_dataset_indexing_and_eval():
    base = build_dataset(_val_cfg())
    ds = build_dataset(dict(type='ConcatDataset',
                            datasets=[_val_cfg(), _val_cfg()]))
    n = len(base)
    assert len(ds) == 2 * n
    x, y = ds[n + 2], ds[2]
    if isinstance(x, list):
        x, y = x[0], y[0]
    np.testing.assert_array_equal(np.asarray(x['img']),
                                  np.asarray(y['img']))
    # perfect predictions -> per-source mIoU 1.0 under separate_eval
    preds = [ds.get_gt_seg_map(i) for i in range(len(ds))]
    out = ds.evaluate(preds, metric='mIoU')
    assert out['0_mIoU'] == 1.0 and out['1_mIoU'] == 1.0
    # merged eval matches the single-source number
    merged = build_dataset(dict(type='ConcatDataset', separate_eval=False,
                                datasets=[_val_cfg(), _val_cfg()]))
    single = base.evaluate([base.get_gt_seg_map(i) for i in range(n)],
                           metric='mIoU')
    got = merged.evaluate(preds, metric='mIoU')
    np.testing.assert_allclose(got['mIoU'], single['mIoU'], rtol=1e-6)
    # SETR variant: plain concat
    setr = build_dataset(dict(type='ConcatDataset_SETR',
                              datasets=[_val_cfg(), _val_cfg()]))
    assert len(setr) == 2 * n
