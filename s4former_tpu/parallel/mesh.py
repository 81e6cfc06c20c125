"""Device mesh + sharding layout.

The reference's one parallelism strategy is synchronous data parallelism
over NCCL (reference: tools/dist_train.sh:7-9, apis/train.py:129-138,
SURVEY.md §2.8). The TPU-native equivalent: a 1-D ``data`` mesh over all
chips; the batch axis of every input is sharded over it, parameters and
optimizer state are replicated. Under ``jax.jit`` XLA then derives every
collective the reference wired by hand:

- gradient mean  <- DDP all-reduce
- BatchNorm cross-replica moments <- SyncBN
- scalar log means <- ``_parse_losses`` all_reduce (base.py:259-276)
- eval histogram sums <- tmpdir/gpu_collect result gather

Multi-host (DCN) runs are the same program — jax.distributed handles the
process group. A ``model`` axis is pre-declared for future tensor
parallelism of ViT-L+ variants (unused at DeiT-B scale, ~86M params).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Device-put a host batch with batch-axis sharding.

    Single process: a plain sharded device_put. Multi-host: every process
    feeds its LOCAL slice of the global batch (loaders run the same seed,
    so each host materializes the full global batch and contributes the
    contiguous block owned by its devices);
    ``jax.make_array_from_process_local_data`` assembles the global
    array without any cross-host data movement (docs/multi_host.md)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)
    from s4former_tpu.parallel.distributed import local_batch_slice

    def put(x):
        import numpy as np
        x = np.asarray(x)
        local = x[local_batch_slice(x.shape[0])]
        return jax.make_array_from_process_local_data(sh, local, x.shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
