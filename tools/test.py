"""Evaluation/inference CLI.

Rebuild of the reference tools/test.py (reference: tools/test.py, apis
single_gpu_test/multi_gpu_test at mmseg/apis/test.py:34,140):
    python tools/test.py CONFIG CHECKPOINT [--eval mIoU] [--show-dir D]
        [--cfg-options k=v ...]
Accepts orbax checkpoints (ours) or .pth state_dicts (reference format).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='Test a segmentor (TPU)')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--eval', nargs='+', default=['mIoU'])
    parser.add_argument('--aug-test', action='store_true',
                        help='multi-scale (0.5-1.75) + flip TTA '
                             '(reference tools/test.py --aug-test)')
    parser.add_argument('--out', help='dump raw predictions here '
                                      '(.pkl, reference --out)')
    parser.add_argument('--show-dir', help='save painted results here')
    parser.add_argument('--format-only', action='store_true',
                        help='materialize submission files via '
                             'dataset.format_results, skip evaluation '
                             '(reference tools/test.py --format-only)')
    parser.add_argument('--imgfile-prefix', default='format_results',
                        help='output dir for --format-only')
    parser.add_argument('--opacity', type=float, default=0.5)
    from s4former_tpu.config import DictAction
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    return parser.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import s4former_tpu.data  # noqa: F401
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.core import checkpoint as ckpt_lib
    from s4former_tpu.data.datasets.custom import build_dataset
    from s4former_tpu.models import build_segmentor, init_segmentor_variables
    from s4former_tpu.models.segmentors.inference import inference
    from s4former_tpu.utils.logger import get_root_logger
    from s4former_tpu.utils.palette import paint_result

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    model = build_segmentor(cfg.model)
    crop = tuple(cfg.get('crop_size', (512, 512)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, crop[0], crop[1], 3))
    if args.checkpoint:
        if args.checkpoint.endswith(('.pth', '.pt')):
            bb = cfg.model.get('backbone', {})
            pre = ckpt_lib.convert_mmseg_checkpoint(
                args.checkpoint, num_layers=bb.get('num_layers', 12),
                dst_grid=(crop[0] // bb.get('patch_size', 16),
                          crop[1] // bb.get('patch_size', 16)))
            variables = ckpt_lib.merge_pretrained(variables, pre)
        else:
            variables = ckpt_lib.load_inference_variables(args.checkpoint)
        logger.info(f'loaded {args.checkpoint}')

    dataset = build_dataset(cfg.data['test'])
    n_cls = len(dataset.CLASSES)
    test_cfg = cfg.model.get('test_cfg') or {}
    test_mode = test_cfg.get('mode', 'whole')
    # slide geometry comes from test_cfg (reference encoder_decoder.py
    # slide_inference reads self.test_cfg.crop_size/stride); the config's
    # train crop_size is only the init shape fallback
    crop = tuple(test_cfg.get('crop_size', crop))
    stride = tuple(test_cfg.get('stride', (341, 341)))

    # Reference semantics (encoder_decoder.py:1118-1172): LOGITS are
    # bilinearly resized to ori_shape BEFORE argmax — identical to the
    # training-time eval path (core/runner.make_eval_fn), so offline and
    # in-training mIoU agree at the same checkpoint. Default bucket 16 =
    # the ViT's own AdaptivePadding divisor, making the path EXACT
    # (composed two-stage resize matrices, see eval_resize_matrices);
    # S4_EVAL_BUCKET=256 re-enables the bounded-compile fast mode for
    # large many-shape val sets.
    from s4former_tpu.core.runner import (_pad_to_bucket,
                                          eval_resize_matrices,
                                          infer_pad_divisor)

    align = getattr(model, 'align_corners', False)
    divisor = infer_pad_divisor(model)
    # default bucket = the model's own corner-pad divisor -> exact
    # reference semantics (see core/runner.make_eval_fn)
    bucket = max(int(os.environ.get('S4_EVAL_BUCKET', divisor)), 1)
    # whole mode reads RAW head logits (reference forward_get_logits) so
    # the composed matrices reproduce head-res -> img -> ori exactly
    raw_whole = (test_mode != 'slide'
                 and hasattr(model, 'forward_decode_from_img'))

    @jax.jit
    def _pred_fn(vs, img, m_h, m_w):
        if raw_whole:
            logits = model.apply(vs, img, train=False,
                                 method='forward_decode_from_img')
        else:
            logits = inference(
                lambda x: model.apply(vs, x, train=False),
                img, n_cls, mode=test_mode, crop_size=crop, stride=stride)
        x = jnp.einsum('oh,nhwc->nowc', m_h, logits,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum('pw,nhwc->nhpc', m_w, x,
                       preferred_element_type=jnp.float32)
        return jnp.argmax(x, axis=-1).astype(jnp.int32)

    matrix_cache = {}
    logit_hw_cache = {}

    def _logit_hw(vs, img_shape):
        if img_shape not in logit_hw_cache:
            if not raw_whole:
                logit_hw_cache[img_shape] = img_shape[1:3]
            else:
                out = jax.eval_shape(
                    lambda im: model.apply(vs, im, train=False,
                                           method='forward_decode_from_img'),
                    jax.ShapeDtypeStruct(img_shape, jnp.float32))
                logit_hw_cache[img_shape] = out.shape[1:3]
        return logit_hw_cache[img_shape]

    def matrices(vs, vh, vw, img_shape, gh, gw):
        lh, lw = _logit_hw(vs, img_shape)

        def support(v, logit_dim, img_dim):
            if not raw_whole:
                return v
            pd = -(-v // divisor) * divisor
            if img_dim <= pd:
                return logit_dim
            return min(logit_dim, int(round(logit_dim * pd / img_dim)))

        key = (vh, vw, lh, lw, gh, gw)
        if key not in matrix_cache:
            m_h, m_w = eval_resize_matrices(
                vh, vw, support(vh, lh, img_shape[1]),
                support(vw, lw, img_shape[2]), lh, lw, (gh, gw),
                align, bucket)
            matrix_cache[key] = (jnp.asarray(m_h), jnp.asarray(m_w))
        return matrix_cache[key]

    tta_segmentor = None
    if args.aug_test:
        from s4former_tpu.apis import Segmentor
        tta_segmentor = Segmentor(model, variables, cfg)

    pre_eval_results = []
    dumped = []
    for idx in range(len(dataset)):
        gt = dataset.get_gt_seg_map(idx)
        gh, gw = gt.shape
        if args.aug_test:
            # reference --aug-test: MultiScaleFlipAug ratios + flip,
            # softmax-averaged at the original resolution
            from s4former_tpu.apis import inference_segmentor_tta
            pred = inference_segmentor_tta(
                tta_segmentor, dataset.img_infos[idx]['filename'])
        else:
            item = dataset.get_item_deterministic(idx, seed=0)
            if isinstance(item, list):
                item = item[0]
            img = np.asarray(item['img'], np.float32)[None]
            img, (vh, vw) = _pad_to_bucket(img, bucket)
            m_h, m_w = matrices(variables, vh, vw, img.shape, gh, gw)
            pred = np.asarray(
                _pred_fn(variables, img, m_h, m_w))[0, :gh, :gw]
        if args.out:
            dumped.append(pred.astype(np.uint8))
        if args.show_dir:
            os.makedirs(args.show_dir, exist_ok=True)
            out = paint_result(
                dataset.img_infos[idx]['filename'], pred,
                dataset.PALETTE, opacity=args.opacity)
            from PIL import Image
            Image.fromarray(out).save(osp.join(
                args.show_dir,
                osp.basename(dataset.img_infos[idx]['ori_filename'])
                .replace('.jpg', '.png')))
        if args.format_only:
            # streamed per-image so the full prediction set never sits in
            # RAM (reference format_only collects all results first)
            dataset.format_results([pred], args.imgfile_prefix,
                                   indices=[idx])
        else:
            pre_eval_results.extend(dataset.pre_eval([pred], [idx]))
        if (idx + 1) % 50 == 0:
            logger.info(f'{idx + 1}/{len(dataset)} images')

    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(dumped, f)
        logger.info(f'wrote {len(dumped)} predictions to {args.out}')

    if args.format_only:
        logger.info(f'wrote submission files to {args.imgfile_prefix}')
        return

    results = dataset.evaluate(pre_eval_results, metric=args.eval)
    for k, v in results.items():
        if not any(k.startswith(p) for p in ('IoU.', 'Acc.', 'Dice.',
                                             'Fscore.')):
            logger.info(f'{k}: {v:.4f}')
    print({k: round(v, 4) for k, v in results.items()
           if k in ('aAcc', 'mIoU', 'mAcc', 'mDice', 'mFscore')})


if __name__ == '__main__':
    main()
