"""Component timing on TPU: backbone fwd, head fwd, full fwd, fwd+bwd."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
import s4former_tpu.models
from __graft_entry__ import FLAGSHIP
from s4former_tpu.models import build_segmentor, init_segmentor_variables
import copy

flagship = copy.deepcopy(FLAGSHIP)
flagship['backbone']['dtype'] = 'bfloat16'
flagship['decode_head']['dtype'] = 'bfloat16'
for aux in flagship['auxiliary_head']:
    aux['dtype'] = 'bfloat16'
model = build_segmentor(flagship)
variables = init_segmentor_variables(model, jax.random.PRNGKey(0), (1, 512, 512, 3))
B = 4
img = jnp.asarray(np.random.RandomState(0).randn(B, 512, 512, 3), jnp.float32)
gt = jnp.asarray(np.random.RandomState(1).randint(0, 21, (B, 512, 512)), jnp.int32)

def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

def timeit(name, fn, *args, n=10):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms')

backbone_fwd = jax.jit(lambda v, x: model.apply(v, method='extract_feat', img=x, train=False))
full_fwd = jax.jit(lambda v, x: model.apply(v, method='forward_train_heads_from_img', img=x, train=False))
decode_fwd = jax.jit(lambda v, x: model.apply(v, method='forward_decode_from_img', img=x, train=False))

def loss_fn(params, bs, x, y):
    (main, aux), upd = model.apply({'params': params, 'batch_stats': bs},
        mutable=['batch_stats'], method='forward_train_heads_from_img', img=x, train=True,
        rngs={'dropout': jax.random.PRNGKey(0)})
    from s4former_tpu.models.losses.cross_entropy import softmax_cross_entropy_with_ignore
    l, _ = softmax_cross_entropy_with_ignore(main, y, 255)
    tot = jnp.mean(l)
    for a in aux:
        la, _ = softmax_cross_entropy_with_ignore(a, y, 255)
        tot += 0.4 * jnp.mean(la)
    return tot

grad_fn = jax.jit(lambda v, x, y: jax.grad(loss_fn)(v['params'], v['batch_stats'], x, y))

timeit('backbone fwd (B=4, eval)', backbone_fwd, variables, img)
timeit('decode-only fwd (B=4, eval)', decode_fwd, variables, img)
timeit('all-heads fwd (B=4, eval)', full_fwd, variables, img)
timeit('sup fwd+bwd all heads (B=4)', grad_fn, variables, img, gt, n=5)
