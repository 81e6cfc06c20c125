"""Single-image inference demo (reference: demo/image_demo.py:28-37).

    python demo/image_demo.py IMG CONFIG [CHECKPOINT] [--out out.png]

CHECKPOINT may be a torch .pth (OpenMMLab layout, converted on load) or
an orbax checkpoint directory produced by this framework's runner.
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

    import numpy as np
    from s4former_tpu.apis import (init_segmentor, inference_segmentor,
                                   show_result_pyplot)

    segmentor = init_segmentor(args.config, args.checkpoint)
    pred = inference_segmentor(segmentor, args.img)
    show_result_pyplot(
        segmentor, args.img, pred,
        palette=segmentor.cfg.get('palette'),
        opacity=args.opacity, out_file=args.out)
    print(f'saved {args.out}; classes present: {np.unique(pred).tolist()}')


if __name__ == '__main__':
    main()
