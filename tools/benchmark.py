"""Inference FPS benchmark (reference: tools/benchmark.py:23-81 — times 200
forward iterations). TPU: jit once, block_until_ready steady-state."""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Benchmark a segmentor')
    parser.add_argument('config')
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--iters', type=int, default=200)
    parser.add_argument('--warmup', type=int, default=10)
    from s4former_tpu.config import DictAction
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.models import build_segmentor, init_segmentor_variables

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    h, w = (args.shape * 2)[:2]
    model = build_segmentor(cfg.model)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (args.batch, h, w, 3))

    @jax.jit
    def fwd(img):
        return model.apply(variables, img, train=False)

    img = jnp.asarray(np.random.randn(args.batch, h, w, 3), jnp.float32)
    for _ in range(args.warmup):
        fwd(img).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(img)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = args.iters * args.batch / dt
    print(f'Overall fps: {fps:.2f} img/s  '
          f'({1000 * dt / args.iters / args.batch:.2f} ms/img)')


if __name__ == '__main__':
    main()
