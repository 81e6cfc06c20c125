"""Single-image inference demo (reference: demo/image_demo.py:28-37).

    python demo/image_demo.py IMG CONFIG [CHECKPOINT] [--out out.png]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('img')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out', default='demo_result.png')
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.core import checkpoint as ckpt_lib
    from s4former_tpu.data.datasets.custom import PascalVOCDataset
    from s4former_tpu.models import build_segmentor, init_segmentor_variables
    from s4former_tpu.models.segmentors.inference import inference
    from s4former_tpu.utils.palette import paint_result

    cfg = Config.fromfile(args.config)
    model = build_segmentor(cfg.model)
    crop = tuple(cfg.get('crop_size', (512, 512)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, crop[0], crop[1], 3))
    if args.checkpoint:
        bb = cfg.model.get('backbone', {})
        pre = ckpt_lib.convert_mmseg_checkpoint(
            args.checkpoint, num_layers=bb.get('num_layers', 12),
            dst_grid=(crop[0] // 16, crop[1] // 16))
        variables = ckpt_lib.merge_pretrained(variables, pre)

    img = np.asarray(Image.open(args.img).convert('RGB')).astype(np.float32)
    norm = cfg.get('img_norm_cfg', dict(
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]))
    x = (img - np.asarray(norm['mean'])) / np.asarray(norm['std'])
    # pad to crop size for whole inference
    h, w = x.shape[:2]
    ph, pw = max(crop[0], h), max(crop[1], w)
    x = np.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
    n_cls = model.num_classes
    probs = inference(
        lambda im: model.apply(variables, im, train=False),
        jnp.asarray(x[None], jnp.float32), n_cls, mode='whole')
    pred = np.asarray(jnp.argmax(probs, -1))[0][:h, :w]
    palette = cfg.get('palette') or PascalVOCDataset.PALETTE
    out = paint_result(img.astype(np.uint8), pred, palette, args.opacity)
    Image.fromarray(out).save(args.out)
    print(f'saved {args.out}; classes present: {np.unique(pred).tolist()}')


if __name__ == '__main__':
    main()
