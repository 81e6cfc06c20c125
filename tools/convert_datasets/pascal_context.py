"""Generate PASCAL-Context 60-class annotations from the Detail API.

Rebuild of (reference: tools/convert_datasets/pascal_context.py): maps the
459-category Detail masks onto the 60-class PASCAL-Context subset
(``_MAPPING`` below, reference :10-17), writes PNG labels to
``VOC2010/SegmentationClassContext`` and the train/val split files to
``VOC2010/ImageSets/SegmentationContext``.

The ``detail`` package (https://github.com/zhanghang1989/detail-api) supplies
``Detail(json, img_dir, split)``; it is an external dependency in the
reference too, and is gated here with guidance. The label-mapping core
(`class_to_index`) is pure numpy and unit-tested without it
(tests/test_data/test_converters.py).

Usage: python tools/convert_datasets/pascal_context.py DEVKIT_PATH JSON_PATH
"""
import argparse
import os
import os.path as osp

import numpy as np

# The 60-class PASCAL-Context subset: Detail category ids (0 = background),
# reference :10-17. Sorted so np.digitize can invert the mapping.
_MAPPING = np.sort(
    np.array([
        0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22, 23, 397, 25, 284,
        158, 159, 416, 33, 162, 420, 454, 295, 296, 427, 44, 45, 46, 308, 59,
        440, 445, 31, 232, 65, 354, 424, 68, 326, 72, 458, 34, 207, 80, 355,
        85, 347, 220, 349, 360, 98, 187, 104, 105, 366, 189, 368, 113, 115
    ]))
_KEY = np.arange(len(_MAPPING)).astype('uint8')


def class_to_index(mask: np.ndarray) -> np.ndarray:
    """Map a Detail category-id mask onto contiguous 0..59 labels.

    Every value in ``mask`` must be one of the 60 ``_MAPPING`` ids
    (reference :21-28 asserts the same); ``np.digitize(..., right=True)``
    over the sorted table is an exact inverse lookup.
    """
    values = np.unique(mask)
    missing = values[~np.isin(values, _MAPPING)]
    if missing.size:
        raise ValueError(
            f'mask contains category ids outside the 60-class subset: '
            f'{missing.tolist()}')
    index = np.digitize(mask.ravel(), _MAPPING, right=True)
    return _KEY[index].reshape(mask.shape)


def _require_detail():
    try:
        from detail import Detail  # noqa: F401  (external, as in the ref)
        return Detail
    except ImportError as e:
        raise ImportError(
            'pascal_context.py needs the `detail` package '
            '(pip install git+https://github.com/zhanghang1989/detail-api'
            '#subdirectory=PythonAPI) to read trainval_merged.json — the '
            'reference converter has the same dependency. The label-mapping '
            'core (class_to_index) works without it.') from e


def _generate(img_id, detail, out_dir):
    from PIL import Image
    mask = class_to_index(detail.getMask(img_id))
    filename = img_id['file_name']
    Image.fromarray(mask).save(
        osp.join(out_dir, filename.replace('jpg', 'png')), 'PNG')
    return osp.splitext(osp.basename(filename))[0]


def main():
    parser = argparse.ArgumentParser(
        description='Convert PASCAL-Context annotations (60-class subset)')
    parser.add_argument('devkit_path', help='pascal voc devkit path')
    parser.add_argument('json_path', help='trainval_merged.json path')
    parser.add_argument('-o', '--out_dir', default=None)
    args = parser.parse_args()

    Detail = _require_detail()
    out_dir = args.out_dir or osp.join(args.devkit_path, 'VOC2010',
                                       'SegmentationClassContext')
    os.makedirs(out_dir, exist_ok=True)
    img_dir = osp.join(args.devkit_path, 'VOC2010', 'JPEGImages')
    split_dir = osp.join(args.devkit_path, 'VOC2010', 'ImageSets',
                         'SegmentationContext')
    os.makedirs(split_dir, exist_ok=True)

    for split in ('train', 'val'):
        detail = Detail(args.json_path, img_dir, split)
        ids = detail.getImgs()
        names = [_generate(i, detail, out_dir) for i in ids]
        with open(osp.join(split_dir, f'{split}.txt'), 'w') as f:
            f.writelines(line + '\n' for line in sorted(names))
        print(f'{split}: {len(names)} masks -> {out_dir}')
    print('Done!')


if __name__ == '__main__':
    main()
