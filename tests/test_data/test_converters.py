"""Dataset converter tools (reference tools/convert_datasets/*)."""
import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_voc_aug_converter(tmp_path):
    from scipy.io import savemat
    devkit = tmp_path / 'VOCdevkit'
    aug = tmp_path / 'benchmark_RELEASE'
    seg_sets = devkit / 'VOC2012' / 'ImageSets' / 'Segmentation'
    cls_dir = aug / 'dataset' / 'cls'
    os.makedirs(seg_sets)
    os.makedirs(cls_dir)
    rng = np.random.RandomState(0)
    aug_names, ori_names = [], []
    for i in range(5):
        name = f'a{i:02d}'
        aug_names.append(name)
        mask = rng.randint(0, 21, (8, 10)).astype(np.uint8)
        # SBD GTcls layout: struct array with a Segmentation field
        savemat(str(cls_dir / f'{name}.mat'),
                {'GTcls': np.array([(mask,)],
                                   dtype=[('Segmentation', object)])})
    for i in range(3):
        ori_names.append(f'o{i:02d}')
    val_names = [aug_names[-1]]
    (aug / 'dataset' / 'train.txt').write_text('\n'.join(aug_names[:3]))
    (aug / 'dataset' / 'val.txt').write_text('\n'.join(aug_names[3:]))
    (seg_sets / 'train.txt').write_text('\n'.join(ori_names))
    (seg_sets / 'val.txt').write_text('\n'.join(val_names))

    import tools.convert_datasets.voc_aug as vocaug
    vocaug.AUG_LEN = 7  # 3 ori + 5 aug - 1 val
    sys.argv = ['voc_aug.py', str(devkit), str(aug)]
    vocaug.main()

    out = devkit / 'VOC2012' / 'SegmentationClassAug'
    assert len(list(out.glob('*.png'))) == 5
    trainaug = (seg_sets / 'trainaug.txt').read_text().split()
    assert len(trainaug) == 7 and val_names[0] not in trainaug
    # mask content survives the .mat -> .png round trip
    png = np.asarray(Image.open(out / 'a00.png'))
    assert png.shape == (8, 10) and png.max() < 21


def test_cityscapes_converter(tmp_path):
    gt = tmp_path / 'gtFine' / 'train' / 'aachen'
    os.makedirs(gt)
    rng = np.random.RandomState(0)
    seg = rng.choice([7, 8, 26, 0, 33], (16, 16)).astype(np.uint8)
    Image.fromarray(seg).save(gt / 'x_gtFine_labelIds.png')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'convert_datasets',
                                      'cityscapes.py'), str(tmp_path)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = np.asarray(Image.open(gt / 'x_gtFine_labelTrainIds.png'))
    assert out[seg == 7].max() == 0 if (seg == 7).any() else True
    assert set(np.unique(out)).issubset({0, 1, 13, 18, 255})


def test_pascal_context_mapping():
    """class_to_index inverts the 60-id table exactly and rejects strays."""
    import tools.convert_datasets.pascal_context as pc
    rng = np.random.RandomState(1)
    # mask drawn from the 60 valid Detail ids, arbitrary positions
    idx = rng.randint(0, 60, (7, 9))
    mask = pc._MAPPING[idx]
    out = pc.class_to_index(mask)
    assert out.dtype == np.uint8
    # digitize over the sorted table must be the exact inverse lookup
    np.testing.assert_array_equal(out, idx.astype(np.uint8))
    # background id 0 -> class 0 (0 is the smallest mapped id)
    assert pc.class_to_index(np.zeros((2, 2), np.int64)).max() == 0
    # ids outside the subset raise with the offending values named
    bad = mask.copy()
    bad[0, 0] = 7  # 7 is not in the 60-class subset
    try:
        pc.class_to_index(bad)
        raise AssertionError('expected ValueError on unmapped id')
    except ValueError as e:
        assert '7' in str(e)
