"""EncoderDecoder segmentor (flax.linen, NHWC).

TPU-native rebuild of the reference ``EncoderDecoder``
(reference: mmseg/models/segmentors/encoder_decoder.py). Architectural
departure, by design:

- This module holds ONLY the network (backbone + decode head + aux heads).
  The reference buries the whole semi-supervised algorithm (EMA twin,
  pseudo-labels, PASA, mixes, NCR) inside the segmentor as stateful methods
  (encoder_decoder.py:386-1066). Here the teacher is the SAME module applied
  with a second parameter pytree, and the algorithm is a pure jitted
  function in ``s4former_tpu.semi.train_step``. That makes every forward
  (student sup, student PASA, student mixed, teacher) one traced program
  with no host round-trips.
- ``inference``/``slide_inference`` are pure functions in
  ``s4former_tpu.models.segmentors.inference``.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import MODELS, SEGMENTORS

Array = jax.Array


def _is_cfg(obj) -> bool:
    # flax converts dict-valued Module fields to FrozenDict; treat any
    # Mapping as a config
    import collections.abc
    return isinstance(obj, collections.abc.Mapping)


def _build_module(cfg):
    if cfg is None:
        return None
    kwargs = {k: v for k, v in cfg.items()}
    # configs are plain python dicts; accept dtype as a string
    if isinstance(kwargs.get('dtype'), str):
        kwargs['dtype'] = jnp.dtype(kwargs['dtype'])
    return MODELS.build(kwargs)


class _AuxVmapBody(nn.Module):
    """vmap body: one aux head applied to one feature level."""
    head_cfg: Any
    train: bool = False

    @nn.compact
    def __call__(self, feat: Array) -> Array:
        cfg = {k: v for k, v in self.head_cfg.items()}
        head_cls = MODELS.get(cfg.pop('type'))
        if isinstance(cfg.get('dtype'), str):
            cfg['dtype'] = jnp.dtype(cfg['dtype'])
        head = head_cls(**cfg, name='head')
        return head(feat, train=self.train)


@SEGMENTORS.register_module()
class EncoderDecoder(nn.Module):
    """Backbone -> (neck) -> decode head (+ aux heads).

    Constructed from config dicts like the reference
    (encoder_decoder.py:25-95); semi-algorithm flags are NOT stored here —
    they live in ``SemiConfig`` consumed by the train step.
    """
    backbone: Union[dict, Any] = None
    decode_head: Union[dict, Any] = None
    neck: Optional[Union[dict, Any]] = None
    auxiliary_head: Optional[Union[dict, list]] = None
    align_corners: bool = False
    # fuse architecturally-identical aux heads (differing only by in_index)
    # into ONE nn.vmap'd stack: 4 separate conv pipelines become one
    # batched pipeline (stacked params under params['aux_heads'])
    fuse_aux_heads: bool = True

    def setup(self):
        self.backbone_m = _build_module(self.backbone) \
            if _is_cfg(self.backbone) else self.backbone
        self.decode_head_m = _build_module(self.decode_head) \
            if _is_cfg(self.decode_head) else self.decode_head
        self.neck_m = _build_module(self.neck) \
            if _is_cfg(self.neck) else self.neck
        aux = self.auxiliary_head
        if _is_cfg(aux):
            aux = [aux]
        self.aux_fused_cfg = None
        self.aux_fused_indices = ()
        if aux is not None and len(aux) and _is_cfg(aux[0]):
            cfgs = [{k: v for k, v in a.items()} for a in aux]
            bases = [{k: v for k, v in c.items() if k != 'in_index'}
                     for c in cfgs]
            if (self.fuse_aux_heads and len(cfgs) > 1 and
                    all(b == bases[0] for b in bases) and
                    all(isinstance(c.get('in_index', 0), int)
                        for c in cfgs)):
                fused_cfg = dict(bases[0])
                fused_cfg['in_index'] = 0  # each vmap lane gets its level
                self.aux_fused_cfg = fused_cfg
                self.aux_fused_indices = tuple(
                    c.get('in_index', 0) for c in cfgs)
                aux = []
            else:
                aux = [_build_module(a) for a in cfgs]
        self.aux_heads = tuple(aux) if aux is not None else tuple()

    @property
    def num_classes(self) -> int:
        head = self.decode_head
        if _is_cfg(head):
            return head['num_classes']
        return head.num_classes

    # ------------------------------------------------------------ forwards
    def extract_feat(self, img: Array, *, train: bool = False,
                     attn_bias: Optional[Array] = None,
                     pos_mode: str = 'default',
                     use_fdrop: bool = False,
                     return_attn: bool = False):
        """Backbone features (tuple of NHWC maps)."""
        kwargs = {}
        # only the ViT/MiT backbones understand these; CNN backbones accept
        # and ignore them like the reference (resnet.py:663-665)
        out = self.backbone_m(
            img, train=train, attn_bias=attn_bias, pos_mode=pos_mode,
            use_fdrop=use_fdrop, return_attn=return_attn, **kwargs)
        if return_attn:
            feats, attn = out
        else:
            feats, attn = out, None
        if self.neck_m is not None:
            feats = self.neck_m(feats, train=train)
        return (feats, attn) if return_attn else feats

    def decode_logits(self, feats, *, train: bool = False,
                      patchmix_perm: Optional[Array] = None,
                      patchmix_n: int = 0) -> Array:
        """Main head logits (the reference ``forward_get_logits``,
        decode_head.py:261-271)."""
        return self.decode_head_m(
            feats, train=train, patchmix_perm=patchmix_perm,
            patchmix_n=patchmix_n)

    @nn.compact
    def aux_logits(self, feats, *, train: bool = False) -> List[Array]:
        # compact: the fused aux stack is created inline (vmap-wrapped
        # submodule); called at most once per apply
        if self.aux_fused_cfg is not None:
            sel = [feats[i] for i in self.aux_fused_indices]
            if all(f.shape == sel[0].shape for f in sel):
                stacked = jnp.stack(sel, axis=0)  # [K, B, h, w, C]
                stack_cls = nn.vmap(
                    _AuxVmapBody,
                    variable_axes={'params': 0, 'batch_stats': 0},
                    split_rngs={'params': True, 'dropout': True,
                                'fdrop': True},
                    in_axes=0, out_axes=0)
                outs = stack_cls(head_cfg=self.aux_fused_cfg, train=train,
                                 name='aux_heads')(stacked)
                return [outs[i] for i in range(outs.shape[0])]
            # shape mismatch across levels: unfused per-level fallback
            heads = [_build_module({**self.aux_fused_cfg, 'in_index': 0})
                     for _ in sel]
            return [h(f, train=train) for h, f in zip(heads, sel)]
        return [h(feats, train=train) for h in self.aux_heads]

    def encode_decode(self, img: Array, *, train: bool = False) -> Array:
        """Logits resized to input resolution (encoder_decoder.py:265-296,
        without the teacher-confidence test-time mask path)."""
        feats = self.extract_feat(img, train=train)
        logits = self.decode_logits(feats, train=train)
        if logits.shape[1:3] != img.shape[1:3]:
            logits = resize_bilinear(logits, img.shape[1:3],
                                     self.align_corners)
        return logits

    def __call__(self, img: Array, *, train: bool = False) -> Array:
        return self.encode_decode(img, train=train)

    def forward_train_heads(self, feats, *, train: bool = True,
                            patchmix_perm: Optional[Array] = None,
                            patchmix_n: int = 0):
        """(decode_logits, [aux_logits...]) for the training step."""
        main = self.decode_logits(feats, train=train,
                                  patchmix_perm=patchmix_perm,
                                  patchmix_n=patchmix_n)
        aux = self.aux_logits(feats, train=train)
        return main, aux

    def forward_decode_from_img(self, img: Array, *, train: bool = True,
                                attn_bias: Optional[Array] = None,
                                pos_mode: str = 'default',
                                use_fdrop: bool = False,
                                patchmix_perm: Optional[Array] = None,
                                patchmix_n: int = 0) -> Array:
        """Main-head logits only (the semi branch never uses aux heads on
        unlabeled data — reference foward_unsup_train uses
        decode_head.forward_get_logits, encoder_decoder.py:650-679)."""
        feats = self.extract_feat(img, train=train, attn_bias=attn_bias,
                                  pos_mode=pos_mode, use_fdrop=use_fdrop)
        return self.decode_logits(feats, train=train,
                                  patchmix_perm=patchmix_perm,
                                  patchmix_n=patchmix_n)

    def forward_train_heads_from_img(self, img: Array, *, train: bool = True,
                                     attn_bias: Optional[Array] = None,
                                     pos_mode: str = 'default',
                                     use_fdrop: bool = False,
                                     patchmix_perm: Optional[Array] = None,
                                     patchmix_n: int = 0):
        feats = self.extract_feat(img, train=train, attn_bias=attn_bias,
                                  pos_mode=pos_mode, use_fdrop=use_fdrop)
        return self.forward_train_heads(feats, train=train,
                                        patchmix_perm=patchmix_perm,
                                        patchmix_n=patchmix_n)


def build_segmentor(cfg: Dict) -> EncoderDecoder:
    """Build a segmentor from a model config dict.

    Drops reference-only keys that configure the semi algorithm or the EMA
    twin (handled by SemiConfig / the train state instead) so reference
    configs load unchanged.
    """
    cfg = dict(cfg)
    cfg.pop('pretrained', None)
    cfg.pop('train_cfg', None)
    cfg.pop('test_cfg', None)
    cfg.pop('init_cfg', None)
    # MiT consumes the PASA flags as module config (the reference passes
    # them per-forward from the segmentor, mit.py:460); propagate them
    # from the reference-shaped segmentor cfg into the backbone cfg
    bb = cfg.get('backbone')
    if isinstance(bb, dict) and bb.get('type') == 'MixVisionTransformer':
        for k in ('attn_mask_weight', 'adaptive_attn_mask'):
            if k in cfg and k not in bb:
                bb = dict(bb)
                bb[k] = cfg[k]
        cfg['backbone'] = bb
    # EMA twins share the student architecture; their config entries are
    # redundant here (reference builds detached copies,
    # encoder_decoder.py:180-214 — in JAX the teacher is just a second
    # parameter pytree of the same module).
    for k in list(cfg):
        if k.endswith('_ema') or k in SEMI_FLAG_KEYS:
            cfg.pop(k)
    return SEGMENTORS.build(cfg)


# every semi-algorithm constructor flag of the reference segmentor
# (encoder_decoder.py:25-95); consumed by s4former_tpu.semi.config
SEMI_FLAG_KEYS = frozenset({
    'ema', 'sup_ema', 'ema_momentum', 'attn_frozen', 'attn_frozen_rate',
    'momentum_backbone', 'momentum_head', 'momentum_head_dropout',
    'momentum_head_exp', 'momentum_exp', 'ema_test',
    'sup_ClassMix', 'sup_cutmix',
    'unsup_weight', 'unsup_confidence', 'unsup_soft', 'unsup_temperature',
    'iter_unsup_start',
    'strong_aug_prob', 'cutout_area', 'use_CutMix', 'use_CutOut',
    'use_ClassMix', 'mix_with_labeled', 'patchwise',
    'use_PatchShuffle', 'PatchMix_N', 'patchmix_ratio', 'patchsize',
    'use_PatchShuffle_w_Classmix', 'use_PatchShuffle_w_Cutmix',
    'no_pos_embed', 'avg_pos_emd', 'duplicate_pos_emd',
    'adaptive_attn_mask', 'attn_mask_weight', 'attn_mask_seperate_head',
    'attn_mask_w_fdrop',
    'negative_class_ranking', 'negative_class_ranking_mode',
    'use_fdrop', 'unimatch', 'fdrop_loss_weight', 'use_cutmix_adaptive',
    'use_attn_mask_inline', 'fuse_unsup_passes',
    'backbone_pretrain', 'projection_head',
})
