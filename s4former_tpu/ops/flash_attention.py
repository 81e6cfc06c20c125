"""Fused flash attention (Pallas/TPU) with additive logit bias.

The hot kernel of the framework: replaces torch ``nn.MultiheadAttention``
inside the ViT encoder (reference: mmseg/models/backbones/vit.py:100-127)
with a blockwise online-softmax kernel that never materializes the
[B, H, L, L] score matrix — and accepts the PASA additive bias
(vit.py:519-541) as a [B, 1|H, L, L] input streamed block-by-block.

Layout: q, k, v are [B, L, H, D]; grid is (B, H, Lq/BLK_Q); the k/v loop is
the innermost grid axis so the compiler pipelines HBM->VMEM block fetches.
Forward saves per-row logsumexp; backward recomputes probabilities
blockwise (flash-attention-2 style: dv/dk from a q-loop kernel, dq from a
k-loop kernel).

The bias input is treated as non-differentiable (PASA bias comes from
stop-gradient'd teacher confidence; the learnable-sigma ablation uses the
XLA path). Sequence lengths are padded to BLK multiples in the wrapper;
padded KEY positions are masked with -inf in-kernel, padded QUERY rows are
sliced off on return.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLK_Q = 128
DEFAULT_BLK_K = 128
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


# ================================================================ forward
def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, sm_scale, blk_k, kv_len,
                valid_len):
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, :, 0, :]                     # [BLK_Q, D]
    k = k_ref[0, :, 0, :]                     # [BLK_K, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
    # mask padded keys
    if valid_len % blk_k != 0 or valid_len != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * blk_k
        s = jnp.where(col < valid_len, s, NEG_INF)

    m_prev = m_ref[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    m_ref[:, 0] = m_cur
    v = v_ref[0, :, 0, :]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv

    @pl.when(kb == nkb - 1)
    def _finish():
        l = l_ref[:, 0]
        inv = 1.0 / jnp.maximum(l, 1e-30)
        o_ref[0, :, 0, :] = (acc_ref[:] * inv[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, :] = m_ref[:, 0] + jnp.log(jnp.maximum(l, 1e-30))


def _fwd(q, k, v, bias, sm_scale, blk_q, blk_k, valid_len):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    grid = (b, h, _cdiv(lq, blk_q), _cdiv(lk, blk_k))

    in_specs = [
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, qi, ki: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, qi, ki: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, qi, ki: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        bh = bias.shape[1]  # 1 or h
        in_specs.append(pl.BlockSpec(
            (1, 1, blk_q, blk_k),
            lambda bi, hi, qi, ki, _bh=bh: (bi, hi if _bh > 1 else 0, qi, ki),
            memory_space=pltpu.VMEM))
        args.append(bias)
        kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                                   blk_k=blk_k, kv_len=lk,
                                   valid_len=valid_len)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, ls, a, m, l, **kw: _fwd_kernel(
                qr, kr, vr, None, o, ls, a, m, l, **kw),
            sm_scale=sm_scale, blk_k=blk_k, kv_len=lk, valid_len=valid_len)

    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((b, h, lq), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, qi, ki: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda bi, hi, qi, ki: (bi, hi, qi),
                     memory_space=pltpu.VMEM),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
    )(*args)
    return o, lse


# =============================================================== backward
def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    *, sm_scale, blk_q, valid_len):
    qb = pl.program_id(3)
    nqb = pl.num_programs(3)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :]
    delta = delta_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qb * blk_q
    s = jnp.where(row < valid_len, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])                       # [BLK_Q, BLK_K]
    # dv += p^T @ do
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # ds = p * (do @ v^T - delta)
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dpv - delta[:, None])
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(qb == nqb - 1)
    def _finish():
        dk_ref[0, :, 0, :] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, :, 0, :] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_acc, *, sm_scale, blk_k, valid_len):
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :]
    delta = delta_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * blk_k
    s = jnp.where(col < valid_len, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dpv - delta[:, None])
    dq_acc[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(kb == nkb - 1)
    def _finish():
        dq_ref[0, :, 0, :] = dq_acc[:].astype(dq_ref.dtype)


def _bwd(sm_scale, blk_q, blk_k, valid_len, residuals, g):
    q, k, v, bias, o, lse = residuals
    do = g
    b, lq, h, d = q.shape
    lk = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                       # [B, L, H]
    delta = delta.transpose(0, 2, 1)               # [B, H, L]

    def bias_spec(bh, q_axis_first):
        if q_axis_first:
            return pl.BlockSpec(
                (1, 1, blk_q, blk_k),
                lambda bi, hi, xi, yi, _bh=bh: (
                    bi, hi if _bh > 1 else 0, yi, xi),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, 1, blk_q, blk_k),
            lambda bi, hi, xi, yi, _bh=bh: (
                bi, hi if _bh > 1 else 0, xi, yi),
            memory_space=pltpu.VMEM)

    # --- dk, dv: grid (b, h, k_blocks, q_blocks), q innermost
    in_specs = [
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, ki, qi: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, ki, qi: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, ki, qi: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(bias_spec(bias.shape[1], q_axis_first=True))
        args.append(bias)
        dkv_kernel = functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale,
                                       blk_q=blk_q, valid_len=valid_len)
    else:
        dkv_kernel = functools.partial(
            lambda qr, kr, vr, dor, lser, dr, dk, dv, dka, dva, **kw:
            _bwd_dkv_kernel(qr, kr, vr, None, dor, lser, dr, dk, dv,
                            dka, dva, **kw),
            sm_scale=sm_scale, blk_q=blk_q, valid_len=valid_len)
    in_specs += [
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, ki, qi: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda bi, hi, ki, qi: (bi, hi, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda bi, hi, ki, qi: (bi, hi, qi),
                     memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, _cdiv(lk, blk_k), _cdiv(lq, blk_q)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, blk_k, 1, d),
                         lambda bi, hi, ki, qi: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, 1, d),
                         lambda bi, hi, ki, qi: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((blk_k, d), jnp.float32),
                        pltpu.VMEM((blk_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
    )(*args)

    # --- dq: grid (b, h, q_blocks, k_blocks), k innermost
    in_specs = [
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, qi, ki: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, qi, ki: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, 1, d), lambda bi, hi, qi, ki: (bi, ki, hi, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(bias_spec(bias.shape[1], q_axis_first=False))
        args.append(bias)
        dq_kernel = functools.partial(_bwd_dq_kernel, sm_scale=sm_scale,
                                      blk_k=blk_k, valid_len=valid_len)
    else:
        dq_kernel = functools.partial(
            lambda qr, kr, vr, dor, lser, dr, dq, dqa, **kw:
            _bwd_dq_kernel(qr, kr, vr, None, dor, lser, dr, dq, dqa, **kw),
            sm_scale=sm_scale, blk_k=blk_k, valid_len=valid_len)
    in_specs += [
        pl.BlockSpec((1, blk_q, 1, d), lambda bi, hi, qi, ki: (bi, qi, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda bi, hi, qi, ki: (bi, hi, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda bi, hi, qi, ki: (bi, hi, qi),
                     memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, _cdiv(lq, blk_q), _cdiv(lk, blk_k)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, 1, d),
                               lambda bi, hi, qi, ki: (bi, qi, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
    )(*args)

    dbias = None if bias is None else jnp.zeros_like(bias)
    return (dq, dk, dv, dbias)


# ================================================================ wrapper
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, bias, sm_scale, blk_q, blk_k, valid_len):
    o, _ = _fwd(q, k, v, bias, sm_scale, blk_q, blk_k, valid_len)
    return o


def _flash_fwd(q, k, v, bias, sm_scale, blk_q, blk_k, valid_len):
    o, lse = _fwd(q, k, v, bias, sm_scale, blk_q, blk_k, valid_len)
    return o, (q, k, v, bias, o, lse)


def _flash_bwd(sm_scale, blk_q, blk_k, valid_len, residuals, g):
    return _bwd(sm_scale, blk_q, blk_k, valid_len, residuals, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    bias: Optional[Array] = None,
                    blk_q: int = DEFAULT_BLK_Q,
                    blk_k: int = DEFAULT_BLK_K) -> Array:
    """q, k, v: [B, L, H, D]; bias broadcastable to [B, H, L, L] (head axis
    may be 1). Returns [B, L, H, D]. Pads L to block multiples internally.
    Bias is non-differentiable (see module docstring)."""
    b, l, h, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    lp = _cdiv(l, max(blk_q, blk_k)) * max(blk_q, blk_k)
    if lp != l:
        pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lp - l),
                                  (0, lp - l)))
    out = _flash(q, k, v, bias, sm_scale, blk_q, blk_k, l)
    return out[:, :l]
