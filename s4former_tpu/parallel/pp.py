"""Pipeline parallelism over a ('data', 'pipe') mesh — GPipe microbatch
schedule as shard_map + ppermute.

The reference framework has no pipeline parallelism (its one strategy is
NCCL DP — reference: tools/dist_train.sh:7-9, apis/train.py:129-138);
like tensor parallelism (parallel/tp.py) this is deliberate capability
BEYOND parity, built the TPU-native way: the ViT layer stack already
lives as ONE stacked pytree (params['layers']['block'], leading [L]
axis), so stage assignment is just sharding that leading axis over a
'pipe' mesh axis, and the schedule is a handful of `lax.ppermute`s
riding ICI neighbours (the scaling-book pipelining recipe).

Schedule (GPipe, no interleaving): the batch splits into M microbatches;
for tick t in [0, M+S-1): stage 0 injects microbatch t (while t < M),
every stage runs its local L/S-layer chunk (a `lax.scan` over the local
slice), activations `ppermute` one hop to the next stage, and the last
stage banks microbatch t-(S-1). A final `psum` over 'pipe' replicates
the outputs (they are zero everywhere but the last stage). Everything is
differentiable — `ppermute`'s transpose is the reversed permutation, so
`jax.grad` through the pipeline yields the textbook 1F1B-equivalent
backward wave without any hand-written backward.

Bubble fraction is (S-1)/(M+S-1); pick M >= 4*S for <20% overhead. For
DeiT-B (86M params) PP is not capacity-motivated — this path exists for
ViT-L/H-scale stacks; numerics (fwd AND grads) are pinned against the
sequential stack in tests/test_parallel/test_pp.py on a (data=2,pipe=4)
CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

Pytree = Any


def make_pp_mesh(num_stages: int, n_devices: Optional[int] = None) -> Mesh:
    """('data', 'pipe') mesh; 'pipe' is the FASTEST-varying axis so
    neighbouring stages sit on adjacent devices (ICI hops, not DCN)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % num_stages == 0, (n, num_stages)
    arr = np.asarray(devices).reshape(n // num_stages, num_stages)
    return Mesh(arr, axis_names=('data', 'pipe'))


def pipeline_apply(layer_fn: Callable[[Pytree, jax.Array], jax.Array],
                   stacked_params: Pytree,
                   x: jax.Array,
                   mesh: Mesh,
                   num_microbatches: int) -> jax.Array:
    """Run a stacked layer pytree as a pipeline over mesh axis 'pipe'.

    Args:
      layer_fn: (single-layer params, activation [b, ...]) -> activation;
        must be batch-local (no cross-example reductions inside).
      stacked_params: pytree whose every leaf has leading axis
        [num_layers]; num_layers % num_stages == 0.
      x: [B, ...] activations; B % (num_microbatches * data) == 0.
      mesh: ('data', 'pipe') mesh from make_pp_mesh.
      num_microbatches: GPipe M.

    Returns [B, ...] outputs, replicated over 'pipe', batch-sharded over
    'data' (same layout as the input).
    """
    num_stages = mesh.shape['pipe']
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    b = x.shape[0]
    m = num_microbatches
    assert b % m == 0, (b, m)
    xs = x.reshape(m, b // m, *x.shape[1:])

    # reshape [L, ...] -> [S, L/S, ...] so 'pipe' shards the stage axis
    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(num_stages, num_layers // num_stages,
                            *a.shape[1:]),
        stacked_params)

    def stage(local_params, xs):
        # inside shard_map: local_params leading axis is [1, L/S] (the
        # local 'pipe' shard); xs is [M, mb_local, ...]
        local_params = jax.tree_util.tree_map(lambda a: a[0], local_params)
        idx = jax.lax.axis_index('pipe')

        def chunk(act):
            def body(c, p1):
                return layer_fn(p1, c), None
            out, _ = jax.lax.scan(body, act, local_params)
            return out

        carry = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
        for t in range(m + num_stages - 1):
            inject = xs[min(t, m - 1)] if t < m else jnp.zeros_like(carry)
            act = jnp.where(idx == 0, inject, carry)
            y = chunk(act)
            k = t - (num_stages - 1)
            if k >= 0:
                write = (idx == num_stages - 1)
                outs = jnp.where(write, outs.at[k].set(y), outs)
            carry = jax.lax.ppermute(y, 'pipe', perm)
        # outputs live on the last stage only; psum replicates them (its
        # gradient is the identity broadcast back, keeping grads exact)
        return jax.lax.psum(outs, 'pipe')

    shard = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(P('pipe'), P(None, 'data')),
        out_specs=P(None, 'data'),
        check_vma=False)
    outs = shard(chunked, xs)
    return outs.reshape(b, *x.shape[1:])
