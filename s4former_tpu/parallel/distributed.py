"""Multi-host initialization.

The reference bootstraps one process per GPU via torch.distributed.launch /
Slurm / MPI and NCCL (reference: tools/train.py:87-91, tools/dist_train.sh,
tools/slurm_train.sh). The TPU-native equivalent is ONE process per host,
`jax.distributed.initialize()` to form the process group over DCN, and the
SAME single-program GSPMD train step — the global mesh simply spans all
hosts' devices; each host feeds its local shard of the batch.

Launchers:
- 'none'      : single host (default) — no init.
- 'tpu'       : TPU pod slice; jax.distributed.initialize() auto-discovers
                coordinator/process count from the TPU metadata.
- 'slurm'     : derive coordinator/rank/world from SLURM_* env (the
                reference's slurm_train.sh role).
- 'mpi'       : derive from OMPI_COMM_WORLD_* env.
- 'env'       : explicit JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
                JAX_PROCESS_ID env (the reference's 'pytorch' launcher
                MASTER_ADDR/RANK/WORLD_SIZE analogue).
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(launcher: str = 'none',
                     coordinator_port: int = 8476) -> bool:
    """Initialize jax.distributed for the given launcher. Returns True if
    a multi-process group was initialized."""
    if launcher in (None, 'none'):
        return False
    import jax
    kwargs = {}
    if launcher == 'tpu':
        pass                        # full auto-detection on TPU pods
    elif launcher == 'slurm':
        nodelist = os.environ.get('SLURM_STEP_NODELIST',
                                  os.environ.get('SLURM_NODELIST', ''))
        head = _first_host(nodelist)
        kwargs = dict(
            coordinator_address=f'{head}:{coordinator_port}',
            num_processes=int(os.environ['SLURM_NTASKS']),
            process_id=int(os.environ['SLURM_PROCID']))
    elif launcher == 'mpi':
        kwargs = dict(
            coordinator_address=os.environ.get(
                'JAX_COORDINATOR_ADDRESS',
                f'127.0.0.1:{coordinator_port}'),
            num_processes=int(os.environ['OMPI_COMM_WORLD_SIZE']),
            process_id=int(os.environ['OMPI_COMM_WORLD_RANK']))
    elif launcher == 'env':
        kwargs = dict(
            coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    else:
        raise ValueError(f'unknown launcher {launcher!r}; expected '
                         "none|tpu|slurm|mpi|env")
    jax.distributed.initialize(**kwargs)
    return True


def _first_host(nodelist: str) -> str:
    """First hostname of a Slurm nodelist ('n[001-004]' -> 'n001')."""
    if '[' not in nodelist:
        return nodelist.split(',')[0]
    prefix, rest = nodelist.split('[', 1)
    first = rest.split(',')[0].split('-')[0].rstrip(']')
    return prefix + first


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch: with N processes each
    feeding global_batch/N examples, jax.make_array_from_process_local_data
    assembles the global array (host shard = contiguous block)."""
    import jax
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
