"""Ablate semi-step components to find where step time goes."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, copy, dataclasses, jax, numpy as np, jax.numpy as jnp
import s4former_tpu.models
from __graft_entry__ import FLAGSHIP
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import create_train_state, make_semi_train_step

flagship = copy.deepcopy(FLAGSHIP)
flagship['backbone']['dtype'] = 'bfloat16'
flagship['decode_head']['dtype'] = 'bfloat16'
for a in flagship['auxiliary_head']:
    a['dtype'] = 'bfloat16'
model = build_segmentor(flagship)
variables = init_segmentor_variables(model, jax.random.PRNGKey(0), (1, 512, 512, 3))

BASE = SemiConfig(
    ema=True, ema_momentum=0.999, unsup_weight=1.0, unsup_confidence=0.95,
    attn_mask_seperate_head=True, attn_mask_weight=5.0,
    adaptive_attn_mask=True, use_PatchShuffle_w_Cutmix=True, PatchMix_N=8,
    negative_class_ranking=True, negative_class_ranking_mode='unsup_only')

rng = np.random.RandomState(0)
batch = {
    'sup_img': jnp.asarray(rng.randn(4, 512, 512, 3), jnp.float32),
    'sup_gt': jnp.asarray(rng.randint(0, 21, (4, 512, 512)), jnp.int32),
    'unsup_teacher_img': jnp.asarray(rng.randn(4, 512, 512, 3), jnp.float32),
    'unsup_student_img': jnp.asarray(rng.randn(4, 512, 512, 3), jnp.float32),
}
sup_batch = {k: v for k, v in batch.items() if k.startswith('sup')}

def sync(st):
    return float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0].astype(jnp.float32)))

def run(name, cfg, b, n=8):
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=21,
                                        base_lr=0.001, max_iters=80001),
                   donate_argnums=0)
    state = create_train_state(variables, ema=cfg.ema)
    key = jax.random.PRNGKey(0)
    state, _ = step(state, b, key)
    sync(state)
    t0 = time.perf_counter()
    for i in range(n):
        state, _ = step(state, b, jax.random.fold_in(key, i))
    sync(state)
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms/step', flush=True)

VARIANTS = {
    'full': ('full S4Former', BASE, 'semi'),
    'noncr': ('no NCR', dataclasses.replace(
        BASE, negative_class_ranking=False), 'semi'),
    'nomix': ('no PatchShuffle+CutMix', dataclasses.replace(
        BASE, use_PatchShuffle_w_Cutmix=False), 'semi'),
    'nopasa': ('no PASA', dataclasses.replace(
        BASE, attn_mask_seperate_head=False,
        adaptive_attn_mask=False), 'semi'),
    'nofuse': ('no fuse_unsup_passes', dataclasses.replace(
        BASE, fuse_unsup_passes=False), 'semi'),
    'mt': ('MT only', SemiConfig(ema=True, ema_momentum=0.999,
                                 unsup_weight=1.0,
                                 unsup_confidence=0.95), 'semi'),
    'sup': ('sup only', SemiConfig(), 'sup'),
}
which = sys.argv[1] if len(sys.argv) > 1 else 'full'
name, cfg, kind = VARIANTS[which]
run(name, cfg, sup_batch if kind == 'sup' else batch)
