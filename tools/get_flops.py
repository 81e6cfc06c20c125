"""FLOPs/params report (reference: tools/get_flops.py:22-50 via mmcv
get_model_complexity_info). TPU-native: count FLOPs from the jaxpr cost
analysis of the jitted forward."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Get FLOPs of a segmentor')
    parser.add_argument('config')
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
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
                                         (1, h, w, 3))
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables['params']))

    def fwd(img):
        return model.apply(variables, img, train=False)

    lowered = jax.jit(fwd).lower(jnp.zeros((1, h, w, 3), jnp.float32))

    def _flops_from(analysis):
        if isinstance(analysis, list):
            analysis = analysis[0] if analysis else None
        if not analysis:
            return float('nan')
        return float(analysis.get('flops', float('nan')))

    # the remote-compile TPU backend reports no cost analysis; the
    # HLO-level (pre-compile) analysis works everywhere
    flops = _flops_from(lowered.cost_analysis())
    if not np.isfinite(flops) or flops <= 0:
        flops = _flops_from(lowered.compile().cost_analysis())
    print('=' * 60)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (XLA cost analysis, fwd): {flops / 1e9:.2f} GFLOPs')
    print('=' * 60)


if __name__ == '__main__':
    main()
