"""Fused flash attention (Pallas/TPU) with additive logit bias.

The hot kernel of the framework: replaces torch ``nn.MultiheadAttention``
inside the ViT encoder (reference: mmseg/models/backbones/vit.py:100-127)
with a blockwise online-softmax kernel that never materializes the
[B, H, L, L] score matrix — and accepts the PASA additive bias
(vit.py:519-541) as a [B, 1|H, L, L] input streamed block-by-block.

Internal layout: q, k, v are flattened to [B*H, L, D] (TPU block rules:
the last two block dims must be (8,128)-aligned or full — D=64 rides as a
full dim). Forward saves per-row logsumexp; backward recomputes
probabilities blockwise (flash-attention-2 style: dk/dv from a q-loop
kernel, dq from a k-loop kernel). When the whole padded sequence fits a
single (q, k) block — the flagship L=1025 geometry — the backward runs
as ONE fused dq+dk+dv kernel instead, skipping the duplicated score
recompute and ``do @ v^T`` (3 of 8 bwd matmuls) and reading the
operands from HBM once.

The bias input is treated as non-differentiable (PASA bias comes from
stop-gradient'd teacher confidence; the learnable-sigma ablation uses the
XLA path). Sequence lengths are padded to block multiples in the wrapper;
padded KEY positions are masked with -inf in-kernel; padded QUERY rows
produce garbage that is sliced off on return.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# measured on v5e at L=1025/d=64: a single full-K block (no online-softmax
# loop) runs the fwd+bwd 1.8x faster than XLA attention; k is chunked only
# beyond FULL_K_MAX (VMEM budget). blk_k must be a multiple of 128.
# None = adaptive: ONE q block spanning the whole padded sequence when the
# f32 score tile fits VMEM (round-2 sweep at L=1025: fwd 2.35 vs 2.49 ms,
# grad 3.83 vs 4.35, and 24% faster fwd with the PASA bias), else 256.
DEFAULT_BLK_Q = None
DEFAULT_BLK_K = None  # None = full padded K in one block

# scoped-VMEM grant for the kernels (v5e has 128M; the 16M default is too
# small for the single-q-block schedule with a bias tile at L=1152, and
# f32 mode needs 32M). Env knob for perf experiments: S4_FLASH_VMEM_MB.
import os as _os
_VMEM_LIMIT = int(_os.environ.get('S4_FLASH_VMEM_MB', '32')) * 1024 * 1024
FULL_K_MAX = 4608
# largest single-q-block seq: blk_q*blk_k f32 scores must fit VMEM
FULL_Q_MAX = 1536
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _is_pow2(x: float) -> bool:
    import math
    m, _ = math.frexp(x)
    return m == 0.5


def _bias_spec(num_heads, bias_heads, blk_q, blk_k, kv_inner):
    """BlockSpec for bias [B, bias_heads, Lq, Lk] on a (B, H, x, y) grid.

    The grid iterates h one step inward of b, so with a broadcast bias
    (bias_heads == 1, the PASA case) the bias block indices are IDENTICAL
    across the H consecutive grid steps of one image — the Pallas
    pipeline elides the repeated DMA and the [Lq, Lk] bias tile is read
    from HBM once per image instead of once per head (12x less bias
    traffic at flagship geometry; the tile is the largest input of the
    kernel at 2.5 MB vs 144 KB per q/k/v block)."""
    if kv_inner:
        def imap(b, h, qi, ki):
            return (b, h if bias_heads > 1 else 0, qi, ki)
    else:
        def imap(b, h, ki, qi):
            return (b, h if bias_heads > 1 else 0, qi, ki)
    return pl.BlockSpec((1, 1, blk_q, blk_k), imap,
                        memory_space=pltpu.VMEM)


# ================================================================ forward
def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, sm_scale, blk_k, valid_len,
                masked):
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                              # [BLK_Q, D]
    k = k_ref[0]                              # [BLK_K, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if sm_scale != 1.0:  # static: the wrapper pre-scales q when exact
        s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if masked:  # static: padded cols not already -inf'd via the bias tile
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * blk_k
        s = jnp.where(col < valid_len, s, NEG_INF)

    m_prev = m_ref[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    m_ref[:, 0] = m_cur
    v = v_ref[0]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv

    @pl.when(kb == nkb - 1)
    def _finish():
        l = l_ref[:, 0]
        inv = 1.0 / jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[:] * inv[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, :] = m_ref[:, 0] + jnp.log(jnp.maximum(l, 1e-30))


def _fwd(q, k, v, bias, num_heads, sm_scale, blk_q, blk_k, valid_len,
         masked, interpret=False):
    bh, lq, d = q.shape
    lk = k.shape[1]
    nh = num_heads
    grid = (bh // nh, nh, _cdiv(lq, blk_q), _cdiv(lk, blk_k))

    in_specs = [
        pl.BlockSpec((1, blk_q, d), lambda b, h, qi, ki: (b * nh + h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, h, qi, ki: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, h, qi, ki: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(_bias_spec(num_heads, bias.shape[1], blk_q, blk_k,
                                   kv_inner=True))
        args.append(bias)
        kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                                   blk_k=blk_k, valid_len=valid_len,
                                   masked=masked)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, ls, a, m, l, **kw: _fwd_kernel(
                qr, kr, vr, None, o, ls, a, m, l, **kw),
            sm_scale=sm_scale, blk_k=blk_k, valid_len=valid_len,
            masked=masked)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, blk_q, d),
                         lambda b, h, qi, ki: (b * nh + h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q),
                         lambda b, h, qi, ki: (b * nh + h, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary'),
            # the single-(q|k)-block schedule at L=1152 with a bias tile
            # measures 16.56M against the default 16M scoped-VMEM limit;
            # v5e has 128M VMEM, so grant the kernels headroom
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return o, lse


# =============================================================== backward
def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    *, sm_scale, blk_q, valid_len, masked):
    qb = pl.program_id(3)
    nqb = pl.num_programs(3)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]
    delta = delta_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if masked:
        # padded-q-row mask. With the mask folded into the bias tile the
        # padded rows instead carry p == 1 — harmless, since their do
        # rows are exactly 0 (cotangent of the sliced-off output pad), so
        # every dk/dv contribution vanishes through do.
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qb * blk_q
        s = jnp.where(row < valid_len, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])                       # [BLK_Q, BLK_K]
    # matmul operands in the INPUT dtype (bf16 on TPU) with f32
    # accumulation: the MXU runs f32xf32 at 1/3 rate, and the low-dtype
    # p/ds tiles are what keep the kernel under the scoped-VMEM limit
    p_lo = p.astype(q.dtype)
    do_lo = do.astype(q.dtype)
    dv_acc[:] += jax.lax.dot_general(
        p_lo, do_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpv = jax.lax.dot_general(do_lo, v,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = (p * (dpv - delta[:, None])).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(qb == nqb - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref,
                      *, sm_scale, valid_len, masked):
    """Single-block dq+dk+dv in ONE pass (flagship L=1025 case).

    When the whole padded sequence fits one (q, k) block — the shipped
    DeiT-B geometry — the two-kernel flash-2 schedule recomputes the
    score matrix and ``do @ v^T`` twice for nothing. Fusing removes 3 of
    the 8 backward matmuls (~29% of bwd FLOPs) and reads q/k/v/do/bias
    from HBM once instead of twice. Masking both padded rows AND padded
    cols to -inf zeroes p there (padded-row lse is log(valid_len) from
    the zero-padded forward, so exp stays exactly 0), which keeps dk/dv
    clean and leaves only the sliced-off padded dq rows as garbage —
    the same contract as the two-kernel path.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]
    delta = delta_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if masked:
        # With the mask folded into the bias tile (wrapper pads the bias
        # rows AND cols with NEG_INF) this branch is skipped: padded cols
        # give p == 0 through the bias; padded rows give p == 1 but their
        # do rows are exactly 0, so dk/dv/ds contributions vanish.
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((row < valid_len) & (col < valid_len), s, NEG_INF)
    p = jnp.exp(s - lse[:, None])
    p_lo = p.astype(q.dtype)
    do_lo = do.astype(q.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p_lo, do_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dpv = jax.lax.dot_general(do_lo, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = (p * (dpv - delta[:, None])).astype(q.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)


def _bwd_fused(q, k, v, bias, do, lse, delta, num_heads, sm_scale,
               blk_q, blk_k, valid_len, masked, interpret):
    bh, lq, d = q.shape
    nh = num_heads
    in_specs = [
        pl.BlockSpec((1, blk_q, d), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        bias_heads = bias.shape[1]
        # h one step inward of b: broadcast (PASA) bias blocks repeat
        # across the H consecutive steps of one image and the pipeline
        # elides the repeated 2.5 MB DMA (see _bias_spec)
        in_specs.append(pl.BlockSpec(
            (1, 1, blk_q, blk_k),
            lambda b, h: (b, h if bias_heads > 1 else 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(bias)
        kernel = functools.partial(_bwd_fused_kernel, sm_scale=sm_scale,
                                   valid_len=valid_len, masked=masked)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, dor, lser, dr, dq, dk, dv, **kw:
            _bwd_fused_kernel(qr, kr, vr, None, dor, lser, dr,
                              dq, dk, dv, **kw),
            sm_scale=sm_scale, valid_len=valid_len, masked=masked)
    in_specs += [
        pl.BlockSpec((1, blk_q, d), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda b, h: (b * nh + h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    # the fused kernel keeps p AND ds live together; in f32 mode that can
    # brush the 32M grant the two-kernel schedule was sized for — scale up
    # (v5e has 128M VMEM)
    vmem = _VMEM_LIMIT if q.dtype == jnp.bfloat16 \
        else max(_VMEM_LIMIT, 64 * 1024 * 1024)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // nh, nh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, h: (b * nh + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, h: (b * nh + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, h: (b * nh + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_acc, *, sm_scale, blk_k,
                   valid_len, masked):
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]
    delta = delta_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if masked:  # padded cols not already -inf'd via the bias tile
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * blk_k
        s = jnp.where(col < valid_len, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])
    do_lo = do.astype(q.dtype)
    dpv = jax.lax.dot_general(do_lo, v,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = (p * (dpv - delta[:, None])).astype(q.dtype)
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(kb == nkb - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd(q, k, v, bias, o, lse, g, num_heads, sm_scale, blk_q, blk_k,
         valid_len, masked, interpret=False):
    do = g
    bh, lq, d = q.shape
    lk = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]               # [BH, 1, L]

    if _cdiv(lq, blk_q) == 1 and _cdiv(lk, blk_k) == 1:
        # whole sequence in one (q, k) block — the flagship L=1025 case:
        # one fused kernel instead of the two-kernel flash-2 schedule
        return _bwd_fused(q, k, v, bias, do, lse, delta, num_heads,
                          sm_scale, blk_q, blk_k, valid_len, masked,
                          interpret)

    nh = num_heads
    qkv_specs_kq = [  # grid (b, h, kblocks, qblocks): q varies innermost
        pl.BlockSpec((1, blk_q, d),
                     lambda b, h, ki, qi: (b * nh + h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d),
                     lambda b, h, ki, qi: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d),
                     lambda b, h, ki, qi: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        qkv_specs_kq.append(_bias_spec(num_heads, bias.shape[1], blk_q,
                                       blk_k, kv_inner=False))
        args.append(bias)
        dkv_kernel = functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale,
                                       blk_q=blk_q, valid_len=valid_len,
                                       masked=masked)
    else:
        dkv_kernel = functools.partial(
            lambda qr, kr, vr, dor, lser, dr, dk, dv, dka, dva, **kw:
            _bwd_dkv_kernel(qr, kr, vr, None, dor, lser, dr, dk, dv,
                            dka, dva, **kw),
            sm_scale=sm_scale, blk_q=blk_q, valid_len=valid_len,
            masked=masked)
    qkv_specs_kq += [
        pl.BlockSpec((1, blk_q, d),
                     lambda b, h, ki, qi: (b * nh + h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q),
                     lambda b, h, ki, qi: (b * nh + h, 0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q),
                     lambda b, h, ki, qi: (b * nh + h, 0, qi),
                     memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh // nh, nh, _cdiv(lk, blk_k), _cdiv(lq, blk_q)),
        in_specs=qkv_specs_kq,
        out_specs=(
            pl.BlockSpec((1, blk_k, d),
                         lambda b, h, ki, qi: (b * nh + h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d),
                         lambda b, h, ki, qi: (b * nh + h, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((blk_k, d), jnp.float32),
                        pltpu.VMEM((blk_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary'),
            # the single-(q|k)-block schedule at L=1152 with a bias tile
            # measures 16.56M against the default 16M scoped-VMEM limit;
            # v5e has 128M VMEM, so grant the kernels headroom
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)

    qkv_specs_qk = [  # grid (b, h, qblocks, kblocks): k varies innermost
        pl.BlockSpec((1, blk_q, d),
                     lambda b, h, qi, ki: (b * nh + h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d),
                     lambda b, h, qi, ki: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d),
                     lambda b, h, qi, ki: (b * nh + h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        qkv_specs_qk.append(_bias_spec(num_heads, bias.shape[1], blk_q,
                                       blk_k, kv_inner=True))
        args.append(bias)
        dq_kernel = functools.partial(_bwd_dq_kernel, sm_scale=sm_scale,
                                      blk_k=blk_k, valid_len=valid_len,
                                      masked=masked)
    else:
        dq_kernel = functools.partial(
            lambda qr, kr, vr, dor, lser, dr, dq, dqa, **kw:
            _bwd_dq_kernel(qr, kr, vr, None, dor, lser, dr, dq, dqa, **kw),
            sm_scale=sm_scale, blk_k=blk_k, valid_len=valid_len,
            masked=masked)
    qkv_specs_qk += [
        pl.BlockSpec((1, blk_q, d),
                     lambda b, h, qi, ki: (b * nh + h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q),
                     lambda b, h, qi, ki: (b * nh + h, 0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q),
                     lambda b, h, qi, ki: (b * nh + h, 0, qi),
                     memory_space=pltpu.VMEM),
    ]
    args += [do, lse, delta]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh // nh, nh, _cdiv(lq, blk_q), _cdiv(lk, blk_k)),
        in_specs=qkv_specs_qk,
        out_specs=pl.BlockSpec((1, blk_q, d),
                               lambda b, h, qi, ki: (b * nh + h, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary'),
            # the single-(q|k)-block schedule at L=1152 with a bias tile
            # measures 16.56M against the default 16M scoped-VMEM limit;
            # v5e has 128M VMEM, so grant the kernels headroom
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)

    return (dq, dk, dv)


# ================================================================ wrapper
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash(q, k, v, bias, num_heads, sm_scale, blk_q, blk_k, valid_len,
           masked, interpret):
    o, _ = _fwd(q, k, v, bias, num_heads, sm_scale, blk_q, blk_k,
                valid_len, masked, interpret)
    return o


def _flash_fwd(q, k, v, bias, num_heads, sm_scale, blk_q, blk_k, valid_len,
               masked, interpret):
    o, lse = _fwd(q, k, v, bias, num_heads, sm_scale, blk_q, blk_k,
                  valid_len, masked, interpret)
    return o, (q, k, v, bias, o, lse)


def _flash_bwd(num_heads, sm_scale, blk_q, blk_k, valid_len, masked,
               interpret, residuals, g):
    q, k, v, bias, o, lse = residuals
    dq, dk, dv = _bwd(q, k, v, bias, o, lse, g, num_heads, sm_scale,
                      blk_q, blk_k, valid_len, masked, interpret)
    # bias is non-differentiable BY API CONTRACT: flash_attention applies
    # stop_gradient to it before this vjp, so the zero cotangent here is
    # unreachable by live gradients (a differentiable bias must use the
    # XLA path; flash_attention raises on bias_differentiable=True).
    dbias = None if bias is None else jnp.zeros_like(bias)
    return (dq, dk, dv, dbias)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    bias: Optional[Array] = None,
                    blk_q: Optional[int] = DEFAULT_BLK_Q,
                    blk_k: Optional[int] = DEFAULT_BLK_K,
                    interpret: Optional[bool] = None,
                    bias_differentiable: bool = False) -> Array:
    """q, k, v: [B, L, H, D]; bias broadcastable to [B, H, L, L] (head axis
    may be 1). Returns [B, L, H, D]. Pads L to block multiples internally.

    The bias is NON-differentiable: stop_gradient is applied to it here
    (PASA bias comes from stop-gradient'd teacher confidence anyway), and
    a caller that needs bias gradients (learnable-sigma ablation) must
    pass ``bias_differentiable=True`` — which raises and directs to the
    XLA path — rather than silently training with a zero gradient.

    ``interpret=None`` auto-enables the Pallas interpreter off-TPU so both
    fwd and bwd kernels run (and are tested) on the CPU mesh."""
    if bias_differentiable:
        raise NotImplementedError(
            'flash_attention does not compute bias gradients; use the XLA '
            'path (ops.attention.dot_product_attention) for a learnable '
            'attention-bias scale')
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
        if q.dtype == jnp.bfloat16:
            # scores carry bf16 precision anyway (q/k are bf16); a bf16
            # bias tile halves its VMEM footprint, which is what lets the
            # single-q-block schedule below fit WITH the PASA bias
            bias = bias.astype(jnp.bfloat16)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, l, h, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    # fold sm_scale into q OUTSIDE the kernel when it is a power of two
    # (d a power of 4 — flagship d=64 gives 1/8): the bf16 multiply is a
    # pure exponent shift (bit-exact) that fuses into the transpose/pad
    # copy below, and it deletes the `s * sm_scale` VPU pass over the
    # [L, L] f32 score tile in ALL FOUR kernels (the kernels are
    # VPU-bound at d=64, not MXU-bound). dq chains through this scale by
    # autodiff of the multiply itself; dk = ds^T @ (q*c) absorbs it.
    if _is_pow2(sm_scale):
        q = q * jnp.asarray(sm_scale, q.dtype)
        sm_scale = 1.0
    if blk_k is None:
        lp128 = _cdiv(l, 128) * 128
        blk_k = lp128 if lp128 <= FULL_K_MAX else 576
    if blk_q is None:
        # one q block spanning the padded sequence (with OR without bias):
        # the bf16 bwd-matmul operands plus the raised per-kernel
        # vmem_limit_bytes keep the tiles inside VMEM at L<=FULL_Q_MAX
        lp128 = _cdiv(l, 128) * 128
        blk_q = lp128 if lp128 <= FULL_Q_MAX else 256
    blk = max(128, blk_k if blk_k >= blk_q else blk_q)
    # pad so blk_k tiles evenly; q grid handles its own ragged last block
    lp = _cdiv(l, blk_k) * blk_k
    lp = max(lp, _cdiv(l, 128) * 128)

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
        if lp != l:
            x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
        return x

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    if bias is not None and lp != l:
        # fold the pad mask into the bias tile: -inf'ing the pad band's
        # rows AND cols makes the in-kernel iota/where mask passes over
        # the [L, L] score tile unnecessary (padded cols: p == 0 through
        # the bias; padded rows: p == 1 but their output is sliced off /
        # their do rows are exactly 0 in the backward). Same HBM traffic
        # as the zero-pad this replaces.
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lp - l), (0, lp - l)),
                       constant_values=NEG_INF)
    masked = (lp != l) and bias is None
    out = _flash(qf, kf, vf, bias, h, sm_scale, blk_q, blk_k, l, masked,
                 interpret)
    out = out[:, :l].reshape(b, h, l, d).transpose(0, 2, 1, 3)
    return out
