"""Multi-checkpoint ensemble evaluation (reference: tools/ensemble_test.py):
average the softmax probabilities of N models before the argmax."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('checkpoints', nargs='+')
    parser.add_argument('--eval', nargs='+', default=['mIoU'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import s4former_tpu.data  # noqa: F401
    from s4former_tpu.apis import init_segmentor
    from s4former_tpu.config import Config
    from s4former_tpu.data.datasets.custom import build_dataset
    from s4former_tpu.models.segmentors.inference import inference

    cfg = Config.fromfile(args.config)
    segs = [init_segmentor(cfg.copy(), c) for c in args.checkpoints]
    dataset = build_dataset(cfg.data['test'])
    n_cls = len(dataset.CLASSES)

    @jax.jit
    def predict(img):
        probs = sum(
            inference(s.apply_fn, img, n_cls, mode=s.mode,
                      crop_size=s.crop_size, stride=s.stride)
            for s in segs) / len(segs)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    results = []
    for idx in range(len(dataset)):
        item = dataset.get_item_deterministic(idx, seed=0)
        if isinstance(item, list):
            item = item[0]
        pred = np.asarray(predict(
            jnp.asarray(item['img'], jnp.float32)[None]))[0]
        gt = dataset.get_gt_seg_map(idx)
        if pred.shape != gt.shape:
            from PIL import Image
            pred = np.asarray(Image.fromarray(pred.astype(np.uint8)).resize(
                (gt.shape[1], gt.shape[0]), Image.NEAREST))
        results.extend(dataset.pre_eval([pred], [idx]))
    print(dataset.evaluate(results, metric=args.eval))


if __name__ == '__main__':
    main()
