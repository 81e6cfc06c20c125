"""Convert Cityscapes gtFine polygons/labelIds to *_labelTrainIds.png.

Rebuild of (reference: tools/convert_datasets/cityscapes.py). Prefers
cityscapesscripts' json2labelImg when installed; otherwise converts the
shipped *_labelIds.png via the standard labelId->trainId table (no
polygon rasterization needed for the official packages, which include
labelIds PNGs).

Usage: python tools/convert_datasets/cityscapes.py CITYSCAPES_PATH
"""
import argparse
import glob
import os.path as osp

# labelId -> trainId (cityscapesscripts.helpers.labels)
LABELID2TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18}


def convert_labelids(path):
    import numpy as np
    from PIL import Image
    seg = np.asarray(Image.open(path))
    out = np.full(seg.shape, 255, np.uint8)
    for lid, tid in LABELID2TRAINID.items():
        out[seg == lid] = tid
    Image.fromarray(out).save(
        path.replace('_labelIds.png', '_labelTrainIds.png'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('cityscapes_path')
    parser.add_argument('--gt-dir', default='gtFine')
    parser.add_argument('--nproc', default=4, type=int)
    args = parser.parse_args()
    gt_dir = osp.join(args.cityscapes_path, args.gt_dir)
    try:
        from cityscapesscripts.preparation.json2labelImg import \
            json2labelImg
        files = sorted(glob.glob(osp.join(gt_dir, '**', '*_polygons.json'),
                                 recursive=True))
        for f in files:
            json2labelImg(f, f.replace('_polygons.json',
                                       '_labelTrainIds.png'), 'trainIds')
    except ImportError:
        files = sorted(glob.glob(osp.join(gt_dir, '**', '*_labelIds.png'),
                                 recursive=True))
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=args.nproc) as pool:
            list(pool.map(convert_labelids, files))
    print(f'converted {len(files)} annotations')


if __name__ == '__main__':
    main()
