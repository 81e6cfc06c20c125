"""SETR-PUP decode head (flax.linen, NHWC).

Rebuild of ``SETRUPHead`` (reference: mmseg/models/decode_heads/setr_up_head.py):
LayerNorm on tokens -> num_convs x [3x3 conv + BN + ReLU + bilinear up] ->
1x1 classifier. PatchShuffle undo happens on the token sequence before the
LN (setr_up_head.py:92-113), driven by an explicit [B, G*G] permutation
array instead of img_metas.

BatchNorm here replaces the reference's SyncBN: under jit with the batch
axis sharded over the device mesh, the batch-moment means are global
(XLA inserts the cross-replica reduction), i.e. SyncBN semantics for free.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.base import (transform_inputs,
                                                   unshuffle_tokens)
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import HEADS

Array = jax.Array


class ConvBNReLU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = self.kernel_size
        x = nn.Conv(self.out_channels, (k, k), padding=(k - 1) // 2,
                    use_bias=False, name='conv', dtype=self.dtype)(x)
        # torch BN momentum 0.1 == flax momentum 0.9
        # flax BatchNorm computes batch statistics in f32 internally;
        # dtype only sets the OUTPUT dtype — keep the activation stream in
        # the compute dtype instead of upcasting [B,H,W,C] maps
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn', dtype=self.dtype)(x)
        return nn.relu(x)


@HEADS.register_module()
class SETRUPHead(nn.Module):
    """Progressive/naive upsampling SETR head."""
    in_channels: int = 768
    channels: int = 256
    num_classes: int = 21
    num_convs: int = 1
    up_scale: int = 4
    kernel_size: int = 3
    in_index: Union[int, Sequence[int]] = 3
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.0
    align_corners: bool = False
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # config keys accepted for parity and consumed elsewhere:
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    norm_layer: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255
    use_addition_up_scale: bool = False

    @nn.compact
    def __call__(self,
                 inputs,
                 *,
                 train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0,
                 return_last_feat: bool = False):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners) \
            if isinstance(inputs, (list, tuple)) else inputs
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        if patchmix_perm is not None and patchmix_n:
            tokens = unshuffle_tokens(tokens, patchmix_perm, patchmix_n)
        tokens = nn.LayerNorm(epsilon=self.norm_eps, name='norm',
                              dtype=self.dtype)(tokens)
        x = tokens.reshape(b, h, w, c).astype(self.dtype)

        # conv_seg (1x1, linear) COMMUTES with the final bilinear upsample:
        # up(x)W + b == up(xW + b) exactly (the 2-tap interp matrices act on
        # H/W, the 1x1 conv on C; interp rows sum to 1 so the bias passes
        # through). Classifying BEFORE the last upsample never materializes
        # the [B, 512, 512, channels] map — the HBM hog of the whole model
        # (5 heads x fwd+bwd) — and upsamples num_classes channels instead.
        # Requires dropout off (flagship/reference SETR-PUP: dropout 0) and
        # no feature-map consumer (return_last_feat).
        defer_last_up = (self.num_convs > 0 and self.dropout_ratio == 0 and
                         not return_last_feat)
        final_scale = self.up_scale * (2 if self.use_addition_up_scale
                                       else 1)
        for i in range(self.num_convs):
            x = ConvBNReLU(self.channels, self.kernel_size,
                           dtype=self.dtype, name=f'up_convs_{i}')(x, train)
            if defer_last_up and i == self.num_convs - 1:
                break
            x = resize_bilinear(
                x, (x.shape[1] * self.up_scale, x.shape[2] * self.up_scale),
                self.align_corners)
            if self.use_addition_up_scale:
                x = resize_bilinear(
                    x, (x.shape[1] * 2, x.shape[2] * 2), self.align_corners)

        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        # classifier AND the deferred upsample run in the model compute
        # dtype: every consumer (CE one-hot contraction, softmax pseudo-
        # labels, NCR, inference) upcasts to f32 inside its own fused
        # elementwise chain, so returning bf16 halves the bytes of the
        # largest tensors in the step ([B,512,512,C] logits x 5 heads x
        # fwd+bwd) without changing any f32-model numerics.
        logits = nn.Conv(self.num_classes, (1, 1), name='conv_seg',
                         dtype=self.dtype)(x)
        if defer_last_up:
            logits = resize_bilinear(
                logits,
                (logits.shape[1] * final_scale,
                 logits.shape[2] * final_scale),
                self.align_corners)
        if return_last_feat:
            return logits, feat
        return logits
