"""MFU roofline for the flagship S4Former train step (VERDICT r2 #3).

Accounts the full jitted step's FLOPs via XLA's HLO-level cost analysis
(works on the remote-compile backend, like tools/get_flops.py) and divides
by the measured steady-state step time to report achieved TFLOP/s against:
  - the chip's MEASURED dense-GEMM rate (147.5 TF/s bf16, BENCH_NOTES.md
    calibration: 8192^3 GEMM), and
  - the nominal bf16 peak (~197 TF/s on v5e).

Prints ONE JSON line. Env knobs mirror bench.py (BENCH_SUP_PER_CHIP, ...).

The axon remote-compile backend returns no HLO cost analysis
(lowered.cost_analysis() -> {}), so FLOP accounting runs in a SEPARATE
CPU-forced pass over the same step function (XLA's dot/conv flop count is
platform-neutral; the CPU pass uses the XLA-attention path, whose matmul
count equals the flash kernel's fwd math). Modes:

  S4_ROOFLINE_MODE=flops  python tools/roofline.py   # CPU: count, write
                                                     # /tmp/roofline_flops.json
  python tools/roofline.py                           # TPU: time the step,
                                                     # merge the flops file
                                                     # if present

Usage:  python tools/roofline.py
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

MEASURED_GEMM_TFLOPS = 147.5
PEAK_BF16_TFLOPS = 197.0
FLOPS_CACHE = '/tmp/roofline_flops.json'


def main():
    flops_mode = os.environ.get('S4_ROOFLINE_MODE') == 'flops'
    import jax
    if flops_mode:
        # count on CPU: pallas TPU kernels don't lower here, so force the
        # XLA attention path (identical dot shapes in fwd; bwd recompute
        # differences are noted in the output)
        jax.config.update('jax_platforms', 'cpu')
        os.environ['BENCH_FLASH'] = '0'
    import jax.numpy as jnp
    import numpy as np

    import s4former_tpu.models  # noqa: F401
    from __graft_entry__ import FLAGSHIP
    from s4former_tpu.models import (build_segmentor,
                                     init_segmentor_variables)
    from s4former_tpu.semi.config import SemiConfig
    from s4former_tpu.semi.train_step import (create_train_state,
                                              make_semi_train_step)

    import copy
    flagship = copy.deepcopy(FLAGSHIP)
    dtype = os.environ.get('BENCH_DTYPE', 'bfloat16')
    flagship['backbone']['dtype'] = dtype
    flagship['backbone']['remat_layers'] = \
        os.environ.get('BENCH_REMAT', '0') == '1'
    flagship['backbone']['use_flash'] = \
        os.environ.get('BENCH_FLASH', '1') == '1'
    flagship['decode_head']['dtype'] = dtype
    for aux in flagship['auxiliary_head']:
        aux['dtype'] = dtype
    model = build_segmentor(flagship)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, 512, 512, 3))
    state = create_train_state(variables, ema=True)
    cfg = SemiConfig(
        ema=True, ema_momentum=0.999, unsup_weight=1.0,
        unsup_confidence=0.95, attn_mask_seperate_head=True,
        attn_mask_weight=5.0, adaptive_attn_mask=True,
        use_PatchShuffle_w_Cutmix=True, PatchMix_N=8,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only')
    step_fn = make_semi_train_step(model, cfg, num_classes=21,
                                   base_lr=0.001, max_iters=80001)

    # default 8+8 = the adopted bench.py headline batch (ADVICE r4):
    # running this tool bare profiles the same config the docs quote
    bs = int(os.environ.get('BENCH_SUP_PER_CHIP', 8))
    bu = int(os.environ.get('BENCH_UNSUP_PER_CHIP', 8))
    rng = np.random.RandomState(0)
    batch = {
        'sup_img': jnp.asarray(rng.randn(bs, 512, 512, 3), jnp.float32),
        'sup_gt': jnp.asarray(rng.randint(0, 21, (bs, 512, 512)),
                              jnp.int32),
        'unsup_teacher_img': jnp.asarray(rng.randn(bu, 512, 512, 3),
                                         jnp.float32),
        'unsup_student_img': jnp.asarray(rng.randn(bu, 512, 512, 3),
                                         jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    # FLOP accounting: HLO-level cost analysis of the WHOLE jitted step
    # (fwd + bwd + EMA + teacher + mixes + SGD). XLA counts each
    # multiply-add as 2 flops for dot/conv — same convention as the
    # MEASURED_GEMM calibration, so the ratio is an honest MFU.
    if flops_mode:
        lowered = jax.jit(step_fn).lower(state, batch, key)
        analysis = lowered.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0] if analysis else {}
        out = {
            'flops': float((analysis or {}).get('flops', float('nan'))),
            'bytes_accessed': float((analysis or {}).get(
                'bytes accessed', float('nan'))),
            'note': 'XLA-attention path (flash kernel does the same fwd '
                    'dots; its bwd recompute adds ~1 extra QK^T+PV per '
                    'layer not counted here)',
        }
        with open(FLOPS_CACHE, 'w') as f:
            json.dump(out, f)
        print(json.dumps(out))
        return

    step_flops = bytes_accessed = float('nan')
    if osp.exists(FLOPS_CACHE):
        with open(FLOPS_CACHE) as f:
            cached = json.load(f)
        step_flops = cached.get('flops', float('nan'))
        bytes_accessed = cached.get('bytes_accessed', float('nan'))

    # steady-state timing (bench.py sync semantics)
    jit_step = jax.jit(step_fn, donate_argnums=0)

    def sync(st):
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    warmup = int(os.environ.get('BENCH_WARMUP', 3))
    steps = int(os.environ.get('BENCH_STEPS', 15))
    for _ in range(warmup):
        state, _ = jit_step(state, batch, key)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = jit_step(state, batch, key)
    sync(state)
    dt = (time.perf_counter() - t0) / steps

    tflops_per_step = step_flops / 1e12
    achieved = tflops_per_step / dt
    out = {
        'metric': 'mfu',
        'step_ms': round(dt * 1e3, 2),
        'tflop_per_step': round(tflops_per_step, 3),
        'achieved_tflops': round(achieved, 2),
        'pct_of_measured_gemm': round(100 * achieved /
                                      MEASURED_GEMM_TFLOPS, 1),
        'pct_of_peak_bf16': round(100 * achieved / PEAK_BF16_TFLOPS, 1),
        'hbm_gb_per_step': round(bytes_accessed / 1e9, 2)
        if np.isfinite(bytes_accessed) else None,
        'img_per_s': round((bs + bu) / dt, 2),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
