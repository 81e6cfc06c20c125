"""Per-frame video inference demo (reference: demo/video_demo.py:10-106).

    python demo/video_demo.py VIDEO CONFIG [CHECKPOINT] \
        [--output-file out.avi] [--palette cityscapes] [--opacity 0.5]

Reads a video (file path or webcam id), runs whole-image inference on
every frame, blends the palette overlay, and writes/shows the result.
CHECKPOINT may be a torch .pth (converted on load) or an orbax
checkpoint directory, same as demo/image_demo.py.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('video', help='video file or webcam id')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--palette', default='cityscapes',
                        help='palette name (cityscapes/voc/ade) — the '
                             'reference defaults to cityscapes too')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-wait-time', default=1, type=int)
    parser.add_argument('--output-file', default=None, type=str)
    parser.add_argument('--output-fourcc', default='MJPG', type=str)
    parser.add_argument('--output-fps', default=-1, type=int)
    parser.add_argument('--output-height', default=-1, type=int)
    parser.add_argument('--output-width', default=-1, type=int)
    parser.add_argument('--opacity', type=float, default=0.5)
    return parser.parse_args()


def main():
    args = parse_args()
    assert args.show or args.output_file, \
        'At least one output should be enabled.'

    import cv2
    import numpy as np

    from s4former_tpu.apis import inference_segmentor, init_segmentor
    from s4former_tpu.core.class_names import get_palette
    from s4former_tpu.utils.palette import paint_result

    segmentor = init_segmentor(args.config, args.checkpoint)
    palette = segmentor.cfg.get('palette') or get_palette(args.palette)

    src = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(src)
    assert cap.isOpened(), f'cannot open video source {args.video!r}'
    in_fps = cap.get(cv2.CAP_PROP_FPS)
    in_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    in_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    writer = None
    if args.output_file is not None:
        fourcc = cv2.VideoWriter_fourcc(*args.output_fourcc)
        fps = args.output_fps if args.output_fps > 0 else in_fps
        w = args.output_width if args.output_width > 0 else in_w
        h = args.output_height if args.output_height > 0 else in_h
        writer = cv2.VideoWriter(args.output_file, fourcc, fps, (w, h))

    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            seg = inference_segmentor(segmentor, rgb)
            drawn = paint_result(rgb, seg, palette, args.opacity)
            drawn = cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR)
            if args.show:
                cv2.imshow('video_demo', drawn)
                cv2.waitKey(args.show_wait_time)
            if writer is not None:
                if drawn.shape[:2] != (h, w):
                    drawn = cv2.resize(drawn, (w, h))
                writer.write(drawn)
            n += 1
    finally:
        if writer is not None:
            writer.release()
        cap.release()
    print(f'processed {n} frames'
          + (f'; saved {args.output_file}' if args.output_file else ''))


if __name__ == '__main__':
    main()
