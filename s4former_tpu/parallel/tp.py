"""Tensor parallelism over a 2-D (data, model) mesh — GSPMD shardings.

The reference framework has exactly one parallelism strategy: NCCL data
parallelism (reference: tools/dist_train.sh:7-9, apis/train.py:129-138).
This module is deliberate capability BEYOND parity: Megatron-style
tensor parallelism of every transformer block, expressed purely as
``PartitionSpec``s on the parameter pytree — no model-code changes, no
hand-written collectives. XLA GSPMD partitions the matmuls and inserts
the all-reduces (the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe from the scaling book).

Sharding rules (Megatron-LM; Shoeybi et al. 2019):

- column-split (output dim over 'model'): ``attn.qkv``, ``ffn.fc1`` —
  their biases follow the output dim;
- row-split (input dim over 'model'): ``attn.proj``, ``ffn.fc2`` — the
  partial-sum all-reduce GSPMD derives here is the block's only
  communication; their biases replicate;
- everything else (LayerNorms, patch embed, pos embed, cls token, heads,
  BatchNorm statistics) replicates. Decode heads are conv-heavy and tiny
  next to the backbone; DP covers them.

The rules key on path SUBSTRINGS so they hold for the ViT stacked-scan
layout (``backbone_m/layers/block/attn/qkv/kernel``: [L, C, 3C], layer
axis leading — specs put 'model' on the last/second-to-last dim and
leave the stack axis alone), for MiT's per-stage blocks, and for the EMA
twin / SGD-momentum trees, which mirror ``params`` structure exactly.

``zero3=True`` additionally shards every rule-matched kernel (and its
EMA/momentum mirror) over the 'data' axis on its other matmul dim —
ZeRO-3 / FSDP semantics out of the compiler: GSPMD all-gathers weights
at each use and reduce-scatters their gradients, so per-device state
memory falls by the data-axis size while the math stays identical
(pinned in tests/test_parallel/test_tp.py).

Scope note: TP here shards parameter + optimizer + activation memory and
compute of the attention/FFN matmuls. The packed-qkv layout means the
3C output split is not head-aligned for every mesh size; GSPMD inserts
a reshard at the head reshape when it isn't. On DeiT-B (86M params) TP
is not needed — this path exists for ViT-L/H-scale variants, validated
numerically (TP=2 x DP=4 == DP-8) in tests/test_parallel/test_tp.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Any

# (path-substring, spec-kind) — first match wins. spec-kind 'col' puts
# 'model' on the LAST axis (kernel out-dim and its bias), 'row' on the
# second-to-last axis of kernels and replicates 1-D leaves (biases of
# row-split layers replicate in Megatron).
_RULES: Tuple[Tuple[str, str], ...] = (
    ('attn/qkv/', 'col'),
    ('attn/in_proj/', 'col'),       # MiT naming
    ('attn/proj/', 'row'),
    ('attn/out_proj/', 'row'),
    ('ffn/fc1/', 'col'),
    ('ffn/fc2/', 'row'),
)


def _spec_for(path: str, ndim: int, shape, axis_size: int,
              zero3_axis: int = 1) -> P:
    is_kernel = path.rstrip('/').endswith('kernel')
    for frag, kind in _RULES:
        if frag in path:
            if kind == 'col':
                if shape[-1] % axis_size:
                    return P()
                spec = [None] * (ndim - 1) + ['model']
                # ZeRO-3 composition: also shard the kernel IN dim over
                # 'data' — XLA all-gathers weights per use and reduce-
                # scatters grads, the ZeRO-3 schedule, for free
                if zero3_axis > 1 and is_kernel and ndim >= 2 \
                        and shape[-2] % zero3_axis == 0:
                    spec[-2] = 'data'
                return P(*spec)
            # row: kernels only — row-split biases replicate in Megatron
            # (keying on the leaf name, since a STACKED bias [L, C] is
            # 2-D and the dim count alone can't tell it from a kernel)
            if is_kernel and ndim >= 2 and shape[-2] % axis_size == 0:
                spec = [None] * (ndim - 2) + ['model', None]
                if zero3_axis > 1 and shape[-1] % zero3_axis == 0:
                    spec[-1] = 'data'
                return P(*spec)
            return P()
    return P()


def tp_param_specs(params: Pytree, mesh: Mesh, zero3: bool = False) -> Pytree:
    """PartitionSpec pytree for ``params`` under ``mesh``'s axes.

    'model' carries the Megatron column/row splits; with ``zero3`` the
    matched kernels are ALSO sharded over 'data' on their other matmul
    dim, which turns the data axis into a ZeRO-3 weight shard (GSPMD
    emits the per-use all-gather + grad reduce-scatter). Works for any
    tree whose structure mirrors ``params`` (EMA twin, SGD momentum —
    so optimizer state is sharded too, the actual ZeRO memory win).
    With model-axis size 1 and zero3=False every spec is ``P()``.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    axis = sizes.get('model', 1)
    zaxis = sizes.get('data', 1) if zero3 else 1

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + k + '/') for k, v in tree.items()}
        if (axis <= 1 and zaxis <= 1) or not hasattr(tree, 'ndim'):
            return P()
        return _spec_for(path, tree.ndim, tree.shape, max(axis, 1), zaxis)

    return walk(params, '/')


def shard_train_state(mesh: Mesh, state, tp: bool = True,
                      zero3: bool = False):
    """Device-put a TrainState: params/EMA/momentum by the TP(+ZeRO-3)
    specs, batch stats + scalars replicated. Without zero3 the DP axis
    never shards state — the batch axis of the inputs carries it."""
    specs = tp_param_specs(state.params, mesh, zero3) if tp else None

    def put_like(tree):
        if specs is None:
            return jax.device_put(tree, NamedSharding(mesh, P()))
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=put_like(state.params),
        batch_stats=jax.device_put(state.batch_stats, rep),
        momentum=put_like(state.momentum),
        ema_params=(None if state.ema_params is None
                    else put_like(state.ema_params)),
        ema_batch_stats=(None if state.ema_batch_stats is None
                         else jax.device_put(state.ema_batch_stats, rep)),
        annealed_momentum=(None if state.annealed_momentum is None
                           else jax.device_put(state.annealed_momentum, rep)),
    )


def tp_out_shardings(mesh: Mesh, state, tp: bool = True,
                     zero3: bool = False):
    """jit ``out_shardings`` pin for (TrainState, logs): keeps the TP
    layout stable across steps so GSPMD never round-trips a resharding
    between iterations."""
    specs = tp_param_specs(state.params, mesh, zero3) if tp else None
    rep = NamedSharding(mesh, P())

    def like(tree):
        if specs is None:
            return jax.tree_util.tree_map(lambda _: rep, tree)
        return jax.tree_util.tree_map(
            lambda _, s: NamedSharding(mesh, s), tree, specs)

    state_sh = state.replace(
        step=rep,
        params=like(state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        momentum=like(state.momentum),
        ema_params=(None if state.ema_params is None
                    else like(state.ema_params)),
        ema_batch_stats=(None if state.ema_batch_stats is None else
                         jax.tree_util.tree_map(lambda _: rep,
                                                state.ema_batch_stats)),
        annealed_momentum=(None if state.annealed_momentum is None else rep),
    )
    return state_sh
