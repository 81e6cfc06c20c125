"""Strip a training checkpoint for release (reference:
tools/publish_model.py — drops optimizer state, appends content hash)."""
import argparse
import hashlib
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('in_ckpt', help='orbax checkpoint dir')
    parser.add_argument('out_ckpt', help='output dir prefix')
    parser.add_argument('--to-pth', action='store_true',
                        help='also write a reference-layout torch '
                             'state_dict next to the published dir '
                             '(loadable by mmseg tools)')
    args = parser.parse_args()

    import jax
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(osp.abspath(args.in_ckpt))
    # keep only inference state
    slim = {k: state[k] for k in ('params', 'batch_stats') if k in state}
    tmp = osp.abspath(args.out_ckpt) + '.tmp'
    ckpt.save(tmp, slim, force=True)
    ckpt.wait_until_finished()
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(slim):
        import numpy as np
        h.update(np.asarray(leaf).tobytes())
    out = f'{osp.abspath(args.out_ckpt)}-{h.hexdigest()[:8]}'
    shutil.move(tmp, out)
    print(f'published {out}')
    if args.to_pth:
        from s4former_tpu.core.checkpoint import export_reference_state_dict
        pth = out + '.pth'
        export_reference_state_dict(slim, pth)
        print(f'exported reference-layout state_dict {pth}')


if __name__ == '__main__':
    main()
