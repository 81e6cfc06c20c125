"""Export the jitted forward to StableHLO text / a compiled artifact.

TPU-native analogue of the reference's tools/pytorch2onnx.py: ONNX is a
CUDA-ecosystem interchange; the XLA-world equivalent for serving is
StableHLO (portable) — usable from PjRt C++ runtimes or IREE.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--out', default='model_stablehlo.mlir')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from s4former_tpu.apis import init_segmentor

    seg = init_segmentor(args.config, args.checkpoint)
    h, w = (args.shape * 2)[:2]

    def fwd(img):
        return seg.apply_fn(img)

    lowered = jax.jit(fwd).lower(jnp.zeros((1, h, w, 3), jnp.float32))
    text = lowered.as_text('stablehlo')
    with open(args.out, 'w') as f:
        f.write(text)
    print(f'wrote {args.out} ({len(text)} bytes of StableHLO)')


if __name__ == '__main__':
    main()
