"""Ring attention — context parallelism over the token axis.

The reference handles large inputs spatially (slide_inference tiles
512² crops — reference: mmseg/models/segmentors/encoder_decoder.py:
1068-1116) and its attention is a single quadratic torch MHA
(vit.py:100); it has no sequence/context sharding of the attention
itself. Like tp/pp/sp (parallel/{tp,pp}.py) this is deliberate
capability BEYOND parity for long-token variants: queries, keys and
values are sharded over a mesh axis, and exact softmax attention is
computed by rotating the K/V shards one ICI hop per step
(`lax.ppermute`) while accumulating an online softmax (running max,
normalizer, and weighted sum — the flash-attention recurrence), so no
rank ever materializes the [L, L] score matrix or the full K/V.

Supports the additive PASA logit bias (vit.py:519-541): the bias rows
belong to the local queries ([b, h, Lq_local, L_total]) and each ring
step dynamic-slices the column block matching the K/V chunk currently
held — the bias never rotates.

Per-step cost: one [b, lq, h, d] x [b, lk, h, d] block matmul + one
K/V ppermute (overlappable); memory O(L/mp) per rank. Exactness (not
an approximation) and grads are pinned against the dense XLA attention
in tests/test_parallel/test_ring_attention.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def ring_attention(q: Array, k: Array, v: Array, axis_name: str,
                   bias: Optional[Array] = None) -> Array:
    """Exact attention with K/V sharded over ``axis_name``.

    Call INSIDE shard_map. Shapes (rank-local):
      q [b, lq, h, d]; k, v [b, lk, h, d] — the local chunks of a
      token-sharded sequence (rank r holds tokens [r*lk, (r+1)*lk));
      bias [b, h, lq, L_total] or None (additive logits, f32).

    Returns [b, lq, h, d] — identical to dense softmax(qk^T/sqrt(d)+bias)v
    over the full sequence.
    """
    mp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    perm = [(i, (i + 1) % mp) for i in range(mp)]

    m = jnp.full((b, h, lq), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, lq), jnp.float32)
    acc = jnp.zeros((b, lq, h, d), jnp.float32)

    for i in range(mp):
        # after i rotations rank `idx` holds K/V chunk (idx - i) mod mp
        src = (idx - i) % mp
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            blk = jax.lax.dynamic_slice_in_dim(
                bias.astype(jnp.float32), src * lk, lk, axis=3)
            logits = logits + blk
        blk_max = jnp.max(logits, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        alpha = jnp.exp(m - new_m)                       # rescale old
        p = jnp.exp(logits - new_m[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
            'bhqk,bkhd->bqhd', p, v.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        m = new_m
        if i != mp - 1:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def make_cp_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ('ctx',) mesh for standalone context parallelism."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('ctx',))


def ring_attention_sharded(q: Array, k: Array, v: Array, mesh: Mesh,
                           bias: Optional[Array] = None) -> Array:
    """Global-shape convenience wrapper: token-shards q/k/v (and the
    bias's query rows) over 'ctx' and runs ring_attention. q/k/v
    [B, L, H, D] with L % mesh.shape['ctx'] == 0."""
    cp = mesh.shape['ctx']
    assert q.shape[1] % cp == 0, (q.shape, cp)

    spec = P(None, 'ctx')
    if bias is None:
        shard = jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, 'ctx'),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)
        return shard(q, k, v)
    bias_spec = P(None, None, 'ctx', None)   # query rows local, keys full
    shard = jax.shard_map(
        lambda q, k, v, b: ring_attention(q, k, v, 'ctx', bias=b),
        mesh=mesh, in_specs=(spec, spec, spec, bias_spec), out_specs=spec,
        check_vma=False)
    return shard(q, k, v, bias)
