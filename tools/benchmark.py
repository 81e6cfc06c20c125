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
    parser.add_argument('--trace', metavar='DIR', default=None,
                        help='capture a jax.profiler trace of the timed '
                             'loop into DIR (view with tensorboard / '
                             'xprof)')
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

    # variables as jit ARGUMENTS (closure constants embed the weights into
    # the HLO payload — breaks this runtime's remote compile, CLAUDE.md)
    @jax.jit
    def fwd(variables, img):
        return model.apply(variables, img, train=False)

    def sync(out):
        # this runtime's block_until_ready does NOT wait for execution;
        # a host transfer of a dependent scalar does (bench.py sync())
        return float(jnp.sum(out[..., 0].astype(jnp.float32)))

    img = jnp.asarray(np.random.randn(args.batch, h, w, 3), jnp.float32)
    for _ in range(args.warmup):
        out = fwd(variables, img)
    sync(out)

    import contextlib
    trace_ctx = (jax.profiler.trace(args.trace) if args.trace
                 else contextlib.nullcontext())
    with trace_ctx:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, img)
        sync(out)
        dt = time.perf_counter() - t0
    if args.trace:
        print(f'profiler trace written to {args.trace}')
    fps = args.iters * args.batch / dt
    print(f'Overall fps: {fps:.2f} img/s  '
          f'({1000 * dt / args.iters / args.batch:.2f} ms/img)')


if __name__ == '__main__':
    main()
