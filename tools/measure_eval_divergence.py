"""Measure the bucketed-eval divergence on a TRAINED checkpoint
(VERDICT r2 #7): exact-shape whole-inference vs pad-to-bucket-and-slice,
reported as logit deltas, argmax agreement, and mIoU both ways on a real
val set. Random-init probes are chaotic; this is the number that matters.

Usage:
  python tools/measure_eval_divergence.py CONFIG CHECKPOINT [--bucket 256]
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
    ap.add_argument('--bucket', type=int, default=256)
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
    from s4former_tpu.core.metrics import pre_eval_to_metrics
    from s4former_tpu.data.datasets.custom import build_dataset
    from s4former_tpu.models import build_segmentor
    from s4former_tpu.ops.resize import resize_bilinear_np

    cfg = Config.fromfile(args.config)
    model = build_segmentor(cfg.model)
    variables = load_inference_variables(args.checkpoint)
    ds = build_dataset(cfg.data['val'])
    align = getattr(model, 'align_corners', False)

    @jax.jit
    def logits_fn(v, img):
        return model.apply(v, img, train=False)

    deltas, agrees = [], []
    pre_exact, pre_pad = [], []
    for idx in range(len(ds)):
        item = ds.get_item_deterministic(idx, seed=0)
        if isinstance(item, list):
            item = item[0]
        img = np.asarray(item['img'], np.float32)[None]
        h, w = img.shape[1:3]
        exact = np.asarray(logits_fn(variables, jnp.asarray(img)))
        ph = -(-h // args.bucket) * args.bucket
        pw = -(-w // args.bucket) * args.bucket
        padded = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        sliced = np.asarray(logits_fn(variables,
                                      jnp.asarray(padded)))[:, :h, :w]
        d = np.abs(exact - sliced)
        deltas.append(float(d.mean() / (np.abs(exact).mean() + 1e-8)))
        agrees.append(float((exact.argmax(-1) == sliced.argmax(-1)).mean()))
        gt = ds.get_gt_seg_map(idx)
        for logits, acc in ((exact, pre_exact), (sliced, pre_pad)):
            lg = logits[0]
            if lg.shape[:2] != gt.shape:
                lg = resize_bilinear_np(lg, gt.shape, align)
            acc.extend(ds.pre_eval([np.argmax(lg, -1).astype(np.int32)],
                                   [idx]))
    m_exact = pre_eval_to_metrics(pre_exact, ('mIoU',))
    m_pad = pre_eval_to_metrics(pre_pad, ('mIoU',))
    print(json.dumps({
        'n_images': len(ds),
        'bucket': args.bucket,
        'rel_logit_delta_mean': round(float(np.mean(deltas)), 5),
        'argmax_agreement_mean': round(float(np.mean(agrees)), 5),
        'mIoU_exact': round(float(np.nanmean(m_exact['IoU'])), 5),
        'mIoU_bucketed': round(float(np.nanmean(m_pad['IoU'])), 5),
    }))


if __name__ == '__main__':
    main()
