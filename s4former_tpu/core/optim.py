"""Optimizer + LR schedule, torch-parity.

Rebuild of the reference's mmcv SGD + poly-LR + paramwise lr_mult stack
(reference: configs/_base_/schedules/schedule_80k_pascal_1over8.py:1-5,
configs/setr/..._MT_w_ours.py:259-262 custom_keys={'head': lr_mult 10}).

- SGD with momentum, torch semantics: buf = m*buf + (g + wd*p);
  p -= lr * buf (torch.optim.SGD default, nesterov off).
- poly LR, mmcv 1.x PolyLrUpdaterHook semantics:
  lr = (base_lr - min_lr) * (1 - iter/max_iter)^power + min_lr.
- per-leaf lr multiplier by substring match on the parameter path (mmcv
  DefaultOptimizerConstructor custom_keys semantics).

Implemented as simple pure functions over pytrees (no optax dependency in
the hot path — the update is one fused tree_map).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def poly_lr(step: jax.Array, base_lr: float, max_iters: int,
            power: float = 0.9, min_lr: float = 1e-4) -> jax.Array:
    """mmcv 1.x PolyLrUpdaterHook (by_epoch=False):
    lr = (base_lr - min_lr) * (1 - progress)^power + min_lr."""
    progress = jnp.minimum(step.astype(jnp.float32) / max_iters, 1.0)
    return (base_lr - min_lr) * (1.0 - progress) ** power + min_lr


def build_lr_mult_tree(params: Pytree,
                       custom_keys: Dict[str, float] | None) -> Pytree:
    """Per-leaf float multiplier; a leaf whose '/'-joined path contains any
    custom key gets that key's lr_mult (longest key wins, mmcv behaviour)."""
    if not custom_keys:
        return jax.tree_util.tree_map(lambda _: 1.0, params)
    sorted_keys = sorted(custom_keys, key=len, reverse=True)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mults = []
    for path, _ in flat:
        name = '/'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                        for p in path)
        mult = 1.0
        for key in sorted_keys:
            if key in name:
                mult = float(custom_keys[key])
                break
        mults.append(mult)
    return jax.tree_util.tree_unflatten(treedef, mults)


def sgd_init(params: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_update(params: Pytree, grads: Pytree, momentum_buf: Pytree,
               lr: jax.Array, lr_mults: Pytree,
               momentum: float = 0.9,
               weight_decay: float = 0.0) -> Tuple[Pytree, Pytree]:
    """One torch-style SGD step. Returns (new_params, new_momentum_buf)."""
    def upd(p, g, buf, mult):
        g = g.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p.astype(jnp.float32)
        buf = momentum * buf + g
        new_p = p - (lr * mult) * buf
        return new_p.astype(p.dtype), buf

    out = jax.tree_util.tree_map(upd, params, grads, momentum_buf, lr_mults)
    new_params = jax.tree_util.tree_map(
        lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_buf = jax.tree_util.tree_map(
        lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, new_buf


def global_grad_norm(grads: Pytree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def clip_grads_by_norm(grads: Pytree, max_norm: float) -> Pytree:
    """mmcv OptimizerHook grad_clip equivalent."""
    norm = global_grad_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)
