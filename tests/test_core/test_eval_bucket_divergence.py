"""Quantify the two documented eval-path divergences (VERDICT r2 #7).

1. Slide-inference geometry parity: our one-XLA-program fori_loop window
   accumulation must equal a literal torch port of the reference loop
   (encoder_decoder.py:1068-1116) given the same per-crop function.

2. Bucket-padding bound: make_eval_fn pads each val image up to a
   shape-bucket multiple and slices the valid region (core/runner.py) —
   the reference runs every exact shape. For conv models the zero-pad can
   only perturb a receptive-field-wide border strip; for the ViT global
   attention mixes everything, so we pin the practical effect (argmax
   agreement + logit delta) instead of exactness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.models.segmentors.inference import slide_inference

NCLS = 5


# ------------------------------------------------- slide geometry parity
def _torch_slide(crop_fn, img_nchw, num_classes, crop, stride):
    """Literal port of the reference loop (:1068-1100)."""
    h_crop, w_crop = crop
    h_stride, w_stride = stride
    b, _, h_img, w_img = img_nchw.shape
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    preds = img_nchw.new_zeros((b, num_classes, h_img, w_img))
    count = img_nchw.new_zeros((b, 1, h_img, w_img))
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1, x1 = hi * h_stride, wi * w_stride
            y2, x2 = min(y1 + h_crop, h_img), min(x1 + w_crop, w_img)
            y1, x1 = max(y2 - h_crop, 0), max(x2 - w_crop, 0)
            logit = crop_fn(img_nchw[:, :, y1:y2, x1:x2])
            preds += F.pad(logit, (int(x1), int(preds.shape[3] - x2),
                                   int(y1), int(preds.shape[2] - y2)))
            count[:, :, y1:y2, x1:x2] += 1
    assert (count == 0).sum() == 0
    return preds / count


def test_slide_inference_matches_reference_loop():
    rng = np.random.RandomState(0)
    img = rng.randn(1, 97, 113, 3).astype(np.float32)
    w = rng.randn(3, NCLS).astype(np.float32)  # per-pixel 1x1 "model"

    def jax_crop_fn(x):
        return jnp.einsum('bhwc,cn->bhwn', x, jnp.asarray(w))

    def torch_crop_fn(x_nchw):
        y = torch.einsum('bchw,cn->bnhw', x_nchw, torch.from_numpy(w))
        return y

    got = slide_inference(jax_crop_fn, jnp.asarray(img), NCLS,
                          crop_size=(48, 48), stride=(32, 32))
    want = _torch_slide(torch_crop_fn,
                        torch.from_numpy(img).permute(0, 3, 1, 2),
                        NCLS, (48, 48), (32, 32))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_slide_inference_single_window_when_image_smaller():
    """h < crop: the reference clamps to one window at origin 0."""
    rng = np.random.RandomState(1)
    img = rng.randn(1, 40, 40, 3).astype(np.float32)
    w = rng.randn(3, NCLS).astype(np.float32)

    def jax_crop_fn(x):
        return jnp.einsum('bhwc,cn->bhwn', x, jnp.asarray(w))

    got = slide_inference(jax_crop_fn, jnp.asarray(img), NCLS,
                          crop_size=(40, 40), stride=(32, 32))
    want = jax_crop_fn(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


# ----------------------------------------------- bucket padding bounds
def _pad_slice_delta(model, variables, img, bucket=64):
    """exact-shape logits vs pad-to-bucket-then-slice logits."""
    h, w = img.shape[1:3]
    exact = np.asarray(model.apply(variables, jnp.asarray(img),
                                   train=False))
    ph = -(-h // bucket) * bucket
    pw = -(-w // bucket) * bucket
    padded = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
    sliced = np.asarray(model.apply(variables, jnp.asarray(padded),
                                    train=False))[:, :h, :w]
    return exact, sliced


def test_bucket_padding_conv_interior_exact():
    """A conv model's logits more than one receptive field away from the
    padded border must be bit-identical; the border strip is the only
    divergence (documented in core/runner.py)."""
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UNet',
                      base_channels=8, num_stages=3,
                      strides=(1, 1, 1), enc_num_convs=(2, 2, 2),
                      dec_num_convs=(2, 2), downsamples=(True, True),
                      norm_cfg=dict(type='BN')),
        decode_head=dict(type='FCNHead', in_channels=8, channels=8,
                         num_convs=1, num_classes=NCLS, in_index=-1,
                         align_corners=False)))
    rng = np.random.RandomState(2)
    img = rng.randn(1, 100, 84, 3).astype(np.float32)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, 100, 84, 3))
    exact, sliced = _pad_slice_delta(model, variables, img, bucket=64)
    # UNet RF with 2 downsamples and 3x3 convs is < 64 px; the interior
    # 64px away from the right/bottom pad border must match exactly
    interior = np.abs(exact[:, :36, :20] - sliced[:, :36, :20]).max()
    assert interior < 1e-5, interior
    full = np.abs(exact - sliced).max()
    # record the border magnitude so regressions are visible
    assert np.isfinite(full)


def test_bucket_padding_vit_divergence_canary():
    """ViT attention is global, so bucket padding perturbs every token
    (pad tokens join attention; pos-embed resizes to the padded grid).
    Measured on RANDOM init the mean relative logit delta is ~0.6-0.7 —
    random-init ViTs are chaotic probes, so this canary only pins that
    the divergence doesn't REGRESS (e.g. pad leaking into BN) beyond the
    measured envelope. The trained-checkpoint measurement (far sharper)
    lives in the eval-path notes; exact-shape eval remains available via
    make_eval_fn(shape_bucket=1)."""
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(0, 1), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=NCLS, in_index=1, num_convs=2,
                         up_scale=4, align_corners=False)))
    rng = np.random.RandomState(3)
    img = rng.randn(1, 96, 80, 3).astype(np.float32)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, 96, 80, 3))
    exact, sliced = _pad_slice_delta(model, variables, img, bucket=64)
    rel = float(np.abs(exact - sliced).mean() / (np.abs(exact).mean()
                                                 + 1e-8))
    assert rel < 0.8, rel
