"""Backbone attention-path timing: flash vs XLA, fwd and fwd+bwd."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
import s4former_tpu.models
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from __graft_entry__ import FLAGSHIP
import copy

def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

def timeit(name, fn, *args, n=10):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms', flush=True)

B = 4
img = jnp.asarray(np.random.RandomState(0).randn(B, 512, 512, 3), jnp.float32)

for flash in (True, False):
    for remat in ('dots', 'full'):
        cfg = copy.deepcopy(FLAGSHIP)
        cfg['backbone']['dtype'] = 'bfloat16'
        cfg['backbone']['use_flash'] = flash
        cfg['backbone']['remat_policy'] = remat
        cfg['decode_head']['dtype'] = 'bfloat16'
        for a in cfg['auxiliary_head']:
            a['dtype'] = 'bfloat16'
        model = build_segmentor(cfg)
        v = init_segmentor_variables(model, jax.random.PRNGKey(0), (1, 512, 512, 3))
        fwd = jax.jit(lambda vv, x: model.apply(vv, method='extract_feat', img=x, train=False)[0])
        def loss(params, bs, x):
            f = model.apply({'params': params, 'batch_stats': bs},
                            method='extract_feat', img=x, train=False)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in f)
        gr = jax.jit(lambda vv, x: jax.grad(loss)(vv['params'], vv['batch_stats'], x))
        tag = f'flash={int(flash)} remat={remat}'
        timeit(f'backbone fwd  {tag}', fwd, v, img)
        timeit(f'backbone fwd+bwd {tag}', gr, v, img, n=5)
