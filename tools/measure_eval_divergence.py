"""Measure the bucketed-eval divergence on a TRAINED checkpoint
(VERDICT r2 #7 / r4 weak #1): exact-shape whole-inference (reference
semantics: net at the exact val shape with its own internal ceil-16
corner pad, logits resized to ori_shape before argmax) vs the shipping
eval path (pad-to-bucket + composed per-image resize matrices,
core/runner.make_eval_fn), reported as prediction agreement and mIoU
both ways on a real val set. Random-init probes are chaotic; this is
the number that matters.

At the round-5 default bucket (16 = the ViT's AdaptivePadding divisor)
the two paths are mathematically identical — this tool is the proof
artifact; at the opt-in fast bucket (256) it quantifies the pad-band
divergence.

Usage:
  python tools/measure_eval_divergence.py CONFIG CHECKPOINT [--bucket 16]
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
    ap.add_argument('--bucket', type=int, default=None,
                    help='eval pre-pad bucket; default = the model pad '
                         'divisor (exact mode)')
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

    from s4former_tpu.core.runner import (eval_resize_matrices,
                                          infer_pad_divisor)

    cfg = Config.fromfile(args.config)
    model = build_segmentor(cfg.model)
    variables = load_inference_variables(args.checkpoint)
    ds = build_dataset(cfg.data['val'])
    align = getattr(model, 'align_corners', False)
    divisor = infer_pad_divisor(model)
    bucket = max(args.bucket if args.bucket else divisor, 1)

    @jax.jit
    def logits_fn(v, img):
        return model.apply(v, img, train=False)

    @jax.jit
    def bucketed_pred_fn(v, img, m_h, m_w):
        # the shipping eval path (core/runner.make_eval_fn _pred): RAW
        # head logits + composed two-stage resize einsums, argmax on
        # device
        logits = model.apply(v, img, train=False,
                             method='forward_decode_from_img')
        x = jnp.einsum('oh,nhwc->nowc', m_h, logits,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum('pw,nhwc->nhpc', m_w, x,
                       preferred_element_type=jnp.float32)
        return jnp.argmax(x, axis=-1).astype(jnp.int32)

    def _support(vdim, logit_dim, img_dim):
        pd = -(-vdim // divisor) * divisor
        if img_dim <= pd:
            return logit_dim
        return min(logit_dim, int(round(logit_dim * pd / img_dim)))

    agrees = []
    pre_exact, pre_pad = [], []
    for idx in range(len(ds)):
        item = ds.get_item_deterministic(idx, seed=0)
        if isinstance(item, list):
            item = item[0]
        img = np.asarray(item['img'], np.float32)[None]
        h, w = img.shape[1:3]
        gt = ds.get_gt_seg_map(idx)
        gh, gw = gt.shape
        # exact side: reference whole_inference semantics — net at the
        # exact shape (model corner-pads internally and resizes logits
        # back to the input shape), logits -> ori_shape -> argmax
        exact = np.asarray(logits_fn(variables, jnp.asarray(img)))[0]
        if exact.shape[:2] != gt.shape:
            exact = resize_bilinear_np(exact, gt.shape, align)
        exact_pred = np.argmax(exact, -1).astype(np.int32)
        # eval-path side: pad-to-bucket + composed matrices (make_eval_fn)
        ph = -(-h // bucket) * bucket
        pw = -(-w // bucket) * bucket
        padded = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        lh, lw = jax.eval_shape(
            lambda im: model.apply(variables, im, train=False,
                                   method='forward_decode_from_img'),
            jax.ShapeDtypeStruct(padded.shape, jnp.float32)).shape[1:3]
        m_h, m_w = eval_resize_matrices(
            h, w, _support(h, lh, ph), _support(w, lw, pw), lh, lw,
            gt.shape, align, bucket)
        pad_pred = np.asarray(bucketed_pred_fn(
            variables, jnp.asarray(padded), jnp.asarray(m_h),
            jnp.asarray(m_w)))[0, :gh, :gw]
        agrees.append(float((exact_pred == pad_pred).mean()))
        pre_exact.extend(ds.pre_eval([exact_pred], [idx]))
        pre_pad.extend(ds.pre_eval([pad_pred], [idx]))
    m_exact = pre_eval_to_metrics(pre_exact, ('mIoU',))
    m_pad = pre_eval_to_metrics(pre_pad, ('mIoU',))
    miou_exact = float(np.nanmean(m_exact['IoU']))
    miou_pad = float(np.nanmean(m_pad['IoU']))
    print(json.dumps({
        'n_images': len(ds),
        'bucket': bucket,
        'argmax_agreement_mean': round(float(np.mean(agrees)), 5),
        'mIoU_exact': round(miou_exact, 5),
        'mIoU_bucketed': round(miou_pad, 5),
        'abs_dmIoU': round(abs(miou_exact - miou_pad), 5),
    }))


if __name__ == '__main__':
    main()
