"""Per-image eval breakdown (pixel acc + per-image mIoU) for a trained
checkpoint — separates which images cap an aggregate score (e.g. the
round-3 fixture question: do the quantized pseudo-labels or the
human-annotated masks limit the overfit mIoU? — VERDICT r3 weak #2).

Usage:  python tools/per_image_eval.py CONFIG CHECKPOINT [--cpu]
Prints one JSON line per image + an aggregate line.
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    import s4former_tpu.data  # noqa: F401
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.core.checkpoint import load_inference_variables
    from s4former_tpu.core.runner import _pad_to_bucket
    from s4former_tpu.data.datasets.custom import build_dataset
    from s4former_tpu.models import build_segmentor
    from s4former_tpu.ops.resize import resize_bilinear_np

    cfg = Config.fromfile(args.config)
    model = build_segmentor(cfg.model)
    variables = load_inference_variables(args.checkpoint)
    ds = build_dataset(cfg.data['val'])
    align = getattr(model, 'align_corners', False)
    n_cls = len(ds.CLASSES)

    @jax.jit
    def logits_fn(v, img):
        return model.apply(v, img, train=False)

    accs = []
    for idx in range(len(ds)):
        item = ds.get_item_deterministic(idx, seed=0)
        if isinstance(item, list):
            item = item[0]
        img = np.asarray(item['img'], np.float32)[None]
        img, (vh, vw) = _pad_to_bucket(img, 256)
        logits = np.asarray(logits_fn(variables, jnp.asarray(img))
                            )[0, :vh, :vw]
        gt = ds.get_gt_seg_map(idx)
        if logits.shape[:2] != gt.shape:
            logits = resize_bilinear_np(logits, gt.shape, align)
        pred = np.argmax(logits, -1).astype(np.int32)
        valid = gt != 255
        acc = float((pred[valid] == gt[valid]).mean())
        ious = []
        for c in np.unique(gt[valid]):
            inter = float(((pred == c) & (gt == c) & valid).sum())
            union = float((((pred == c) | (gt == c)) & valid).sum())
            ious.append(inter / max(union, 1.0))
        name = ds.img_infos[idx]['filename']
        accs.append((name, acc, float(np.mean(ious))))
        print(json.dumps({'image': name, 'acc': round(acc, 4),
                          'per_image_mIoU': round(float(np.mean(ious)), 4),
                          'classes': int(len(ious))}))
    print(json.dumps({
        'n': len(accs),
        'mean_acc': round(float(np.mean([a for _, a, _ in accs])), 4),
        'mean_per_image_mIoU': round(
            float(np.mean([m for _, _, m in accs])), 4)}))


if __name__ == '__main__':
    main()
