"""Micro-bench the flash-attention kernel variants at the flagship
geometry (L=1025, d=64, H=12, DeiT-B) on the real TPU.

Round-5 perf attack (VERDICT r4 next #2a): the 8+8 profile shows flash
custom-calls at ~108 ms/step (~31%) while the dense matmuls run near
speed-of-light. At d=64 the MXU work per program is ~4.6 us but the
measured per-program time is ~24 us -> the kernel is VPU-bound on the
softmax passes over the [L, L] f32 score tile, not MXU-bound. The
round-5 kernel therefore deletes VPU passes instead of reshaping
matmuls: sm_scale folded into q in the wrapper (bit-exact exponent
shift at d=64) and the pad mask folded into the streamed bias tile —
this tool times the shipping kernel against the XLA path to quantify
those changes (and any future kernel experiments) at the flagship
geometry.

Timing: dependent-scalar sync (bench.py sync() pattern) — this runtime's
block_until_ready does not synchronize.

Usage:  python tools/bench_flash_variants.py [--steps 30] [--batch 16]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu  # noqa: F401  (compile cache setup)
from s4former_tpu.ops import flash_attention as fa


def sync(x):
    """Pull a dependent scalar to host (block_until_ready does not
    synchronize on this runtime — see bench.py)."""
    return float(np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32)))))


def timeit(fn, args, steps):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    s = sync(out if not isinstance(out, tuple) else out[0])
    dt = (time.perf_counter() - t0) / steps
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--seq', type=int, default=1025)
    ap.add_argument('--heads', type=int, default=12)
    ap.add_argument('--dim', type=int, default=64)
    ap.add_argument('--grad', action='store_true',
                    help='time value_and_grad instead of fwd-only')
    args = ap.parse_args()

    b, l, h, d = args.batch, args.seq, args.heads, args.dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, l, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, l, h, d), jnp.bfloat16)
    bias = jax.random.normal(kb, (b, 1, l, l), jnp.bfloat16)

    def run(fn, tag, *a):
        if args.grad:
            def loss(q_, k_, v_):
                return jnp.sum(fn(q_, k_, v_, *a).astype(jnp.float32))
            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            dt, s = timeit(lambda *xs: f(*xs)[0], (q, k, v), args.steps)
        else:
            f = jax.jit(lambda q_, k_, v_: fn(q_, k_, v_, *a))
            dt, s = timeit(f, (q, k, v), args.steps)
        # attention FLOPs (QK + PV, fwd; x2.5 rough for grad)
        fl = 4 * b * h * l * l * d * (2.5 if args.grad else 1.0)
        print(f'{tag:28s} {dt * 1e3:8.3f} ms   {fl / dt / 1e12:6.1f} TF/s'
              f'   (checksum {s:.3e})')

    print(f'geometry: B={b} L={l} H={h} D={d} '
          f'{"fwd+bwd" if args.grad else "fwd"} x{args.steps}')
    run(fa.flash_attention, 'flash (no bias)')
    run(fa.flash_attention, 'flash (PASA bias)', bias)
    try:
        from s4former_tpu.ops.attention import dot_product_attention

        def xla(q_, k_, v_, *a):
            return dot_product_attention(q_, k_, v_, *(a or (None,)))[0]
        run(xla, 'XLA (no bias)')
        run(xla, 'XLA (PASA bias)', bias)
    except Exception as e:  # pragma: no cover
        print('XLA path skipped:', e)


if __name__ == '__main__':
    main()
