"""Build the 10582-image augmented VOC training set from SBD .mat labels.

Rebuild of (reference: tools/convert_datasets/voc_aug.py): converts
benchmark_RELEASE ``dataset/cls/*.mat`` GTcls masks to PNGs in
``VOC2012/SegmentationClassAug`` and writes the trainaug/aug split files.
mmcv's parallel progress is replaced by a thread pool (PIL releases the
GIL for encode/IO).

Usage: python tools/convert_datasets/voc_aug.py DEVKIT_PATH AUG_PATH
"""
import argparse
import os
import os.path as osp
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

AUG_LEN = 10582


def convert_mat(mat_file, in_dir, out_dir):
    import numpy as np
    from PIL import Image
    from scipy.io import loadmat
    data = loadmat(osp.join(in_dir, mat_file))
    mask = data['GTcls'][0]['Segmentation'][0].astype(np.uint8)
    Image.fromarray(mask).save(
        osp.join(out_dir, mat_file.replace('.mat', '.png')), 'PNG')


def main():
    parser = argparse.ArgumentParser(
        description='Convert PASCAL VOC + SBD aug annotations')
    parser.add_argument('devkit_path', help='pascal voc devkit path')
    parser.add_argument('aug_path', help='SBD benchmark_RELEASE path')
    parser.add_argument('-o', '--out_dir', default=None)
    parser.add_argument('--nproc', default=4, type=int)
    args = parser.parse_args()

    out_dir = args.out_dir or osp.join(args.devkit_path, 'VOC2012',
                                       'SegmentationClassAug')
    os.makedirs(out_dir, exist_ok=True)
    in_dir = osp.join(args.aug_path, 'dataset', 'cls')
    mats = [f for f in sorted(os.listdir(in_dir)) if f.endswith('.mat')]
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        list(pool.map(lambda m: convert_mat(m, in_dir, out_dir), mats))
    print(f'converted {len(mats)} masks -> {out_dir}')

    def read_list(*parts):
        with open(osp.join(*parts)) as f:
            return [line.strip() for line in f]

    full_aug = read_list(args.aug_path, 'dataset', 'train.txt') + \
        read_list(args.aug_path, 'dataset', 'val.txt')
    seg_dir = osp.join(args.devkit_path, 'VOC2012/ImageSets/Segmentation')
    ori_train = read_list(seg_dir, 'train.txt')
    val = read_list(seg_dir, 'val.txt')

    aug_train = sorted(set(ori_train + full_aug) - set(val))
    assert len(aug_train) == AUG_LEN, \
        f'len(aug_train_list)={len(aug_train)} != {AUG_LEN}'
    with open(osp.join(seg_dir, 'trainaug.txt'), 'w') as f:
        f.writelines(line + '\n' for line in aug_train)
    aug_only = sorted(set(full_aug) - set(ori_train + val))
    with open(osp.join(seg_dir, 'aug.txt'), 'w') as f:
        f.writelines(line + '\n' for line in aug_only)
    print('Done!')


if __name__ == '__main__':
    main()
