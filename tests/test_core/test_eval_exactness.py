"""Round-5 eval exactness (VERDICT r4 weak #1 / next #1).

Pins the two halves of the exact-faithful default eval path:

1. The ViT corner-pads non-16-divisible inputs itself (reference
   AdaptivePadding 'corner', mmseg/models/utils/embed.py:12-81, wired at
   vit.py:303) and ``encode_decode`` resizes logits back to the exact
   input shape (encoder_decoder.py:281-296) — so feeding an eval image
   pre-padded to ceil-16 is mathematically the SAME program, with the
   final two resizes (padded->exact->ori) composable into one matrix.

2. ``make_eval_fn`` at its round-5 default (shape_bucket = the model's
   pad divisor, composed ``eval_resize_matrices``) produces predictions
   and mIoU identical to direct exact-shape whole-inference — the
   reference semantics (whole_inference, encoder_decoder.py:1118-1172).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.ops.resize import resize_bilinear_np

NCLS = 5


@pytest.fixture(scope='module')
def vit_segmentor():
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(0, 1), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=NCLS, in_index=1, num_convs=2,
                         up_scale=2, align_corners=False)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3))
    return model, variables


def test_vit_corner_pad_matches_explicit_prepad(vit_segmentor):
    """RAW head logits of model(exact non-divisible img) must be
    bit-comparable to model(ceil16-prepadded img): the internal
    AdaptivePadding produces the identical network input, so the whole
    transformer + head computation coincides. This is the property the
    exact eval path (pre-pad to the divisor + composed resize matrices)
    rests on."""
    model, variables = vit_segmentor
    rng = np.random.RandomState(0)
    h, w = 70, 93                       # ceil16 -> (80, 96)
    img = rng.randn(1, h, w, 3).astype(np.float32)
    raw = np.asarray(model.apply(variables, jnp.asarray(img), train=False,
                                 method='forward_decode_from_img'))
    padded = np.pad(img, ((0, 0), (0, 80 - h), (0, 96 - w), (0, 0)))
    raw_pad = np.asarray(model.apply(variables, jnp.asarray(padded),
                                     train=False,
                                     method='forward_decode_from_img'))
    # head at up_scale=2/num_convs=2 -> tokens(5,6) x4 = (20, 24)
    assert raw.shape == raw_pad.shape == (1, 20, 24, NCLS)
    np.testing.assert_allclose(raw, raw_pad, rtol=1e-5, atol=1e-5)
    # and the full apply resizes those logits to the exact input shape
    # (encode_decode -> img.shape, reference encoder_decoder.py:281-296)
    exact = np.asarray(model.apply(variables, jnp.asarray(img),
                                   train=False))
    assert exact.shape == (1, h, w, NCLS)
    want = resize_bilinear_np(raw, (h, w), False)
    np.testing.assert_allclose(exact, want, rtol=1e-4, atol=1e-4)


def test_vit_divisible_input_unchanged(vit_segmentor):
    """16-divisible inputs must hit the no-op pad branch (the 512-crop
    training path is untouched by the round-5 change)."""
    model, variables = vit_segmentor
    rng = np.random.RandomState(1)
    img = rng.randn(1, 64, 80, 3).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(img), train=False))
    assert out.shape == (1, 64, 80, NCLS)
    assert np.isfinite(out).all()


class _NonDivisibleDataset:
    """Val images at keep-ratio-like NON-16-divisible shapes with
    different ori (gt) shapes — the configuration where the old bucketed
    path measurably diverged."""
    CLASSES = tuple('abcde')
    ignore_index = 255

    def __init__(self, n=6):
        rng = np.random.default_rng(0)
        self.items = []
        shapes = [(70, 93), (50, 77), (64, 91), (70, 93), (45, 60),
                  (50, 77)][:n]
        for (h, w) in shapes:
            gt_shape = (h + 7, w + 11)
            self.items.append((
                rng.standard_normal((h, w, 3)).astype(np.float32),
                rng.integers(0, NCLS, gt_shape).astype(np.int32)))

    def __len__(self):
        return len(self.items)

    def get_item_deterministic(self, idx, seed=0):
        return {'img': self.items[idx][0]}

    def get_gt_seg_map(self, idx):
        return self.items[idx][1]

    def pre_eval(self, preds, indices):
        from s4former_tpu.core.metrics import intersect_and_union
        return [tuple(np.asarray(x) for x in intersect_and_union(
            np.asarray(p), self.get_gt_seg_map(i), NCLS, 255))
            for p, i in zip(preds, indices)]


def _exact_preds(model, variables, ds):
    """Reference whole_inference semantics, image by image at the exact
    shape: logits -> bilinear to ori_shape -> argmax."""
    preds = []
    for idx in range(len(ds)):
        img = ds.get_item_deterministic(idx)['img'][None]
        logits = np.asarray(model.apply(variables, jnp.asarray(img),
                                        train=False))[0]
        gt = ds.get_gt_seg_map(idx)
        if logits.shape[:2] != gt.shape:
            logits = resize_bilinear_np(logits, gt.shape, False)
        preds.append(np.argmax(logits, -1).astype(np.int32))
    return preds


def test_default_eval_fn_is_exact(vit_segmentor):
    """make_eval_fn at the round-5 default must agree with direct
    exact-shape inference: >=99.9% per-pixel argmax agreement (float-
    association slack only) and |dmIoU| <= 1e-3 — the VERDICT r4
    acceptance bar, met here with margin on every image."""
    from s4former_tpu.core.metrics import pre_eval_to_metrics
    from s4former_tpu.core.runner import infer_pad_divisor, make_eval_fn
    model, variables = vit_segmentor
    assert infer_pad_divisor(model) == 16
    ds = _NonDivisibleDataset()

    class _S:
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})

    eval_fn = make_eval_fn(model, ds, capture_images=len(ds))
    metrics = eval_fn(_S())

    exact = _exact_preds(model, variables, ds)
    pre = []
    for idx, p in enumerate(exact):
        pre.extend(ds.pre_eval([p], [idx]))
    tables = pre_eval_to_metrics(pre, ('mIoU',))
    miou_exact = float(np.nanmean(tables['IoU']))

    assert abs(metrics['mIoU'] - miou_exact) <= 1e-3, \
        (metrics['mIoU'], miou_exact)
    for (_, pred, _), want in zip(eval_fn.last_samples, exact):
        agree = float((pred == want).mean())
        assert agree >= 0.999, agree


def test_fast_bucket_mode_still_available(vit_segmentor, monkeypatch):
    """S4_EVAL_BUCKET=64 opts back into the bounded-compile fast mode:
    fewer compiled signatures, metrics finite (divergence documented,
    measured by tools/measure_eval_divergence.py)."""
    from s4former_tpu.core.runner import make_eval_fn
    model, variables = vit_segmentor
    ds = _NonDivisibleDataset()

    class _S:
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})

    monkeypatch.setenv('S4_EVAL_BUCKET', '64')
    fast = make_eval_fn(model, ds)
    m = fast(_S())
    assert np.isfinite(m['mIoU'])
    assert len(fast.compiled_shapes) <= 4, fast.compiled_shapes
