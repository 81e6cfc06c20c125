"""Child process for test_multiprocess_init.py — NOT a test module.

Forms a real 2-process jax.distributed group over localhost (the 'env'
launcher = the reference's MASTER_ADDR/RANK/WORLD_SIZE analogue,
tools/dist_train.sh:7-9), checks the group shape, runs a cross-process
collective, then the FULL semi train step over the global 4-device mesh
via __graft_entry__.dryrun_multichip — the same program single-host runs
(docs/multi_host.md: multi-host is not a different code path).
"""
import os
import os.path as osp
import sys

import jax

jax.config.update('jax_platforms', 'cpu')  # sitecustomize forces TPU

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    from s4former_tpu.parallel.distributed import init_distributed
    assert init_distributed('env')
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    # cross-process collective: mean over a batch whose halves live on
    # different PROCESSES (host 0 feeds rows 0-3, host 1 rows 4-7)
    import numpy as np
    import jax.numpy as jnp
    from s4former_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    g = np.arange(8, dtype=np.float32)
    arr = shard_batch(mesh, {'x': g})['x']
    mean = jax.jit(jnp.mean)(arr)
    np.testing.assert_allclose(float(mean), 3.5)

    # the full flagship-flag semi train step, 4 global devices, 2 hosts
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)

    print(f'MULTIPROC_OK process={jax.process_index()}', flush=True)


if __name__ == '__main__':
    main()
