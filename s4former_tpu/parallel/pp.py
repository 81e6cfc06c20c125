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


# --------------------------------------------------------------------------
# 3-D composition: data x pipe x model (tensor parallelism INSIDE each
# pipeline stage). The GSPMD TP of parallel/tp.py cannot be used inside
# shard_map (manual mode), so the transformer block is re-expressed with
# explicit Megatron collectives: qkv/fc1 column-split, proj/fc2 row-split
# with a `psum` over 'model' — the only two communications per layer.
# Numerics are pinned against the sequential flax stack in
# tests/test_parallel/test_pp.py (fwd AND grads).
# --------------------------------------------------------------------------

def make_pp_tp_mesh(num_stages: int, model_parallel: int,
                    n_devices: Optional[int] = None) -> Mesh:
    """('data', 'pipe', 'model') mesh. 'model' is fastest-varying (the
    per-layer psum rides adjacent devices), then 'pipe' (one ICI hop per
    stage boundary), then 'data' (gradient all-reduce, least frequent)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (num_stages * model_parallel) == 0, (
        n, num_stages, model_parallel)
    arr = np.asarray(devices).reshape(
        n // (num_stages * model_parallel), num_stages, model_parallel)
    return Mesh(arr, axis_names=('data', 'pipe', 'model'))


def _repack_qkv(leaf: jax.Array, embed_dims: int, num_heads: int,
                model_parallel: int) -> jax.Array:
    """Reorder the packed q|k|v output axis (length 3C, torch-MHA layout)
    into per-rank packs q_r|k_r|v_r so a contiguous 'model' shard of the
    last axis is a complete local attention block (head-aligned)."""
    c, h, mp = embed_dims, num_heads, model_parallel
    blk = (h // mp) * (c // h)
    idx = np.concatenate([
        np.arange(part * c + r * blk, part * c + (r + 1) * blk)
        for r in range(mp) for part in range(3)])
    return jnp.take(leaf, jnp.asarray(idx), axis=-1)


def _tp_block(p, x, num_heads_local: int, eps: float = 1e-6,
              sequence_parallel: bool = False):
    """One pre-LN transformer block with rank-local TP shards; matches
    TransformerEncoderLayer numerics (models/backbones/vit.py:98-142,
    XLA attention path, deterministic, no attn bias).

    ``sequence_parallel`` (Megatron-SP, Korthikanti et al. 2022): x is
    SEQUENCE-sharded [b, L/mp, C] between blocks — LayerNorms and the
    residual stream run on the local chunk, an all-gather over 'model'
    precedes each column-split matmul, and the row-split partial sums
    reduce-scatter back along L instead of all-reducing. Same bandwidth
    as plain TP (AG+RS == AR), 1/mp the inter-block activation bytes.
    """
    def ln(v, scale, bias):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.var(v, axis=-1, keepdims=True)
        return (v - mu) / jnp.sqrt(var + eps) * scale + bias

    def gather(v):
        return jax.lax.all_gather(v, 'model', axis=1, tiled=True) \
            if sequence_parallel else v

    def reduce(v):
        return jax.lax.psum_scatter(v, 'model', scatter_dimension=1,
                                    tiled=True) \
            if sequence_parallel else jax.lax.psum(v, 'model')

    hl = num_heads_local
    y = gather(ln(x, p['ln1_s'], p['ln1_b']))    # [b, L, C]
    b, l, c = y.shape
    qkv = y @ p['qkv_k'] + p['qkv_b']            # [b, L, 3C/mp]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = q.shape[-1] // hl
    q = q.reshape(b, l, hl, d)
    k = k.reshape(b, l, hl, d)
    v = v.reshape(b, l, hl, d)
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, l, hl * d)
    attn = reduce(out @ p['proj_k']) + p['proj_b']
    x = x + attn
    z = gather(ln(x, p['ln2_s'], p['ln2_b']))
    h1 = jax.nn.gelu(z @ p['fc1_k'] + p['fc1_b'], approximate=False)
    ffn = reduce(h1 @ p['fc2_k']) + p['fc2_b']
    return x + ffn


def pipeline_apply_tp(stacked_params: Pytree,
                      x: jax.Array,
                      mesh: Mesh,
                      num_microbatches: int,
                      num_heads: int,
                      sequence_parallel: bool = False) -> jax.Array:
    """GPipe over 'pipe' with each stage's layers tensor-parallel over
    'model' and the microbatch sharded over 'data' — full 3-D parallelism
    of the ViT stack in one shard_map.

    Args:
      stacked_params: TransformerEncoderLayer param tree with leading
        [num_layers] axis on every leaf (the `nn.scan` layout:
        ln1/attn.qkv/attn.proj/ln2/ffn.fc1/ffn.fc2).
      x: [B, L, C] tokens; B % (num_microbatches * data) == 0.
      mesh: from make_pp_tp_mesh.
      num_heads: global head count; % model_parallel == 0.
      sequence_parallel: Megatron-SP — inter-block activations (and the
        pipeline's ppermute traffic) are sequence-sharded over 'model';
        requires L % model_parallel == 0 (pad 1025 -> 1026 for the
        flagship's cls+32x32 geometry).

    Returns [B, L, C], replicated over 'pipe'/'model', sharded over
    'data' (same layout as the input).
    """
    s = mesh.shape['pipe']
    mp = mesh.shape['model']
    assert num_heads % mp == 0, (num_heads, mp)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert num_layers % s == 0, (num_layers, s)
    b, l, c = x.shape
    if sequence_parallel:
        assert l % mp == 0, (l, mp)
    m = num_microbatches
    assert b % m == 0, (b, m)
    xs = x.reshape(m, b // m, l, c)

    sp = stacked_params
    leaves = {
        'ln1_s': sp['ln1']['scale'], 'ln1_b': sp['ln1']['bias'],
        'qkv_k': _repack_qkv(sp['attn']['qkv']['kernel'], c, num_heads, mp),
        'qkv_b': _repack_qkv(sp['attn']['qkv']['bias'], c, num_heads, mp),
        'proj_k': sp['attn']['proj']['kernel'],
        'proj_b': sp['attn']['proj']['bias'],
        'ln2_s': sp['ln2']['scale'], 'ln2_b': sp['ln2']['bias'],
        'fc1_k': sp['ffn']['fc1']['kernel'],
        'fc1_b': sp['ffn']['fc1']['bias'],
        'fc2_k': sp['ffn']['fc2']['kernel'],
        'fc2_b': sp['ffn']['fc2']['bias'],
    }
    # [L, ...] -> [S, L/S, ...]
    leaves = {k: v.reshape(s, num_layers // s, *v.shape[1:])
              for k, v in leaves.items()}
    specs = {
        'ln1_s': P('pipe'), 'ln1_b': P('pipe'),
        'qkv_k': P('pipe', None, None, 'model'),
        'qkv_b': P('pipe', None, 'model'),
        'proj_k': P('pipe', None, 'model', None),
        'proj_b': P('pipe'),
        'ln2_s': P('pipe'), 'ln2_b': P('pipe'),
        'fc1_k': P('pipe', None, None, 'model'),
        'fc1_b': P('pipe', None, 'model'),
        'fc2_k': P('pipe', None, 'model', None),
        'fc2_b': P('pipe'),
    }
    hl = num_heads // mp

    def stage(p, xs):
        p = {k: v[0] for k, v in p.items()}      # local stage chunk
        idx = jax.lax.axis_index('pipe')

        def chunk(act):
            def body(carry, p1):
                return _tp_block(p1, carry, hl,
                                 sequence_parallel=sequence_parallel), None
            out, _ = jax.lax.scan(body, act, p)
            return out

        carry = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % s) for i in range(s)]
        for t in range(m + s - 1):
            inject = xs[min(t, m - 1)] if t < m else jnp.zeros_like(carry)
            act = jnp.where(idx == 0, inject, carry)
            y = chunk(act)
            k = t - (s - 1)
            if k >= 0:
                outs = jnp.where(idx == s - 1, outs.at[k].set(y), outs)
            carry = jax.lax.ppermute(y, 'pipe', perm)
        return jax.lax.psum(outs, 'pipe')

    # under SP the token axis (axis 2 of [M, b, L, C]) is sharded over
    # 'model' end to end: injected microbatches, the ppermuted carry, and
    # the banked outputs all move 1/mp-sized tensors
    x_spec = P(None, 'data', 'model') if sequence_parallel \
        else P(None, 'data')
    shard = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(specs, x_spec),
        out_specs=x_spec,
        check_vma=False)
    outs = shard(leaves, xs)
    return outs.reshape(b, l, c)
