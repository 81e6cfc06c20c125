"""Capture a jax.profiler trace of the flagship train step and print the
device-op time breakdown (no TensorBoard needed — parses the chrome-trace
JSON the profiler writes).

This is how the round-2 CE-gather regression was found (7 take_along_axis
fusions at 15.5 ms each = 31% of the step): run it whenever the bench
moves unexpectedly.

    python tools/profile_trace.py            # trace 3 steps, then report
    python tools/profile_trace.py DIR        # just re-analyze DIR

Replaces the reference's absent tracing story (SURVEY.md §5: "none
integrated") with an actionable one.
"""
import collections
import glob
import gzip
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def analyze(trace_dir: str, steps: int = 3):
    files = sorted(glob.glob(
        osp.join(trace_dir, 'plugins/profile/*/*.trace.json.gz')))
    if not files:
        raise SystemExit(f'no trace under {trace_dir}')
    tr = json.load(gzip.open(files[-1]))
    events = tr['traceEvents']
    pids = {e['pid']: e['args'].get('name', '') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev_pids = [p for p, n in pids.items() if 'TPU' in n or 'GPU' in n]
    if not dev_pids:
        dev_pids = [p for p, n in pids.items() if 'CPU' not in n] or \
            list(pids)
    dev = dev_pids[0]
    tids = {e['tid']: e['args'].get('name', '') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'thread_name'
            and e['pid'] == dev}
    op_tid = next((t for t, n in tids.items() if n == 'XLA Ops'), None)
    mod_tid = next((t for t, n in tids.items() if n == 'XLA Modules'), None)

    agg = collections.defaultdict(float)
    src = {}
    mod_total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e['pid'] != dev:
            continue
        if e['tid'] == mod_tid:
            mod_total += e.get('dur', 0)
        if e['tid'] != op_tid:
            continue
        agg[e['name']] += e.get('dur', 0)
        a = e.get('args') or {}
        if 'source' in a:
            src[e['name']] = (a.get('source', ''),
                              a.get('hlo_category', ''))
    print(f'device-module total: {mod_total / steps / 1e3:.1f} ms/step '
          f'(device {pids.get(dev)})')
    cats = collections.defaultdict(float)
    for n, d in agg.items():
        cats[src.get(n, ('', 'other'))[1]] += d
    print('\nby HLO category (nested ops double-count inside loops):')
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1])[:12]:
        print(f'  {d / steps / 1e3:8.2f} ms/step  {c}')
    print('\ntop ops:')
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        s, c = src.get(n, ('', ''))
        print(f'  {d / steps / 1e3:7.2f} ms/step  {n[:44]:46s} '
              f'{c[:14]:14s} {s[-58:]}')


def capture(trace_dir: str, steps: int = 3):
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    import s4former_tpu.models  # noqa: F401
    from __graft_entry__ import FLAGSHIP
    from s4former_tpu.models import (build_segmentor,
                                     init_segmentor_variables)
    from s4former_tpu.semi.config import SemiConfig
    from s4former_tpu.semi.train_step import (create_train_state,
                                              make_semi_train_step)

    flagship = copy.deepcopy(FLAGSHIP)
    for part in ['backbone', 'decode_head']:
        flagship[part]['dtype'] = 'bfloat16'
    for a in flagship['auxiliary_head']:
        a['dtype'] = 'bfloat16'
    flagship['backbone']['remat_layers'] = \
        os.environ.get('BENCH_REMAT', '0') == '1'
    model = build_segmentor(flagship)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, 512, 512, 3))
    cfg = SemiConfig(
        ema=True, ema_momentum=0.999, unsup_weight=1.0,
        unsup_confidence=0.95, attn_mask_seperate_head=True,
        attn_mask_weight=5.0, adaptive_attn_mask=True,
        use_PatchShuffle_w_Cutmix=True, PatchMix_N=8,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only')
    step = jax.jit(make_semi_train_step(
        model, cfg, num_classes=21, base_lr=0.001, max_iters=80001),
        donate_argnums=0)
    state = create_train_state(variables, ema=True)
    rng = np.random.RandomState(0)
    # default 8+8 = the adopted bench.py headline batch (ADVICE r4):
    # running this tool bare profiles the same config the docs quote
    bs = int(os.environ.get('BENCH_SUP_PER_CHIP', 8))
    bu = int(os.environ.get('BENCH_UNSUP_PER_CHIP', 8))
    batch = {
        'sup_img': jnp.asarray(rng.randn(bs, 512, 512, 3), jnp.float32),
        'sup_gt': jnp.asarray(rng.randint(0, 21, (bs, 512, 512)),
                              jnp.int32),
        'unsup_teacher_img':
            jnp.asarray(rng.randn(bu, 512, 512, 3), jnp.float32),
        'unsup_student_img':
            jnp.asarray(rng.randn(bu, 512, 512, 3), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    def sync(st):
        return float(jnp.sum(
            jax.tree_util.tree_leaves(st.params)[0].astype(jnp.float32)))

    for _ in range(3):
        state, _ = step(state, batch, key)
    sync(state)
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, _ = step(state, batch, key)
        sync(state)
    print(f'traced {steps} steps into {trace_dir}')


if __name__ == '__main__':
    if len(sys.argv) > 1:
        analyze(sys.argv[1])
    else:
        d = '/tmp/s4_trace'
        capture(d)
        analyze(d)
