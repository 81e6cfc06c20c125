"""Cascade encoder-decoder (OCR/PointRend-style refinement chain).

Rebuild of the reference ``CascadeEncoderDecoder``
(reference: mmseg/models/segmentors/cascade_encoder_decoder.py:86 LoC,
unused by the S4Former configs but part of the segmentor API): the first
decode head runs on backbone features; each subsequent head additionally
receives the previous head's logits.
"""
from __future__ import annotations

from typing import Any, List, Optional, Union

import jax

from s4former_tpu.models.segmentors.encoder_decoder import (EncoderDecoder,
                                                            _build_module,
                                                            _is_cfg)
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import SEGMENTORS

Array = jax.Array


@SEGMENTORS.register_module()
class CascadeEncoderDecoder(EncoderDecoder):
    num_stages: int = 2

    def setup(self):
        super().setup()
        heads = self.decode_head
        if _is_cfg(heads):
            heads = [heads]
        if isinstance(heads, (list, tuple)) and len(heads) and \
                _is_cfg(heads[0]):
            heads = [_build_module(h) for h in heads]
        self.cascade_heads = tuple(heads) if isinstance(
            heads, (list, tuple)) else (heads,)

    @property
    def num_classes(self) -> int:
        head = self.decode_head
        if isinstance(head, (list, tuple)):
            head = head[-1]
        if _is_cfg(head):
            return head['num_classes']
        return head.num_classes

    def decode_logits(self, feats, *, train: bool = False,
                      patchmix_perm=None, patchmix_n: int = 0) -> Array:
        out = self.cascade_heads[0](feats, train=train,
                                    patchmix_perm=patchmix_perm,
                                    patchmix_n=patchmix_n)
        for head in self.cascade_heads[1:]:
            out = head(list(feats) + [out], train=train)
        return out

    def forward_train_heads(self, feats, *, train: bool = True,
                            patchmix_perm=None, patchmix_n: int = 0):
        logits: List[Array] = []
        out = self.cascade_heads[0](feats, train=train,
                                    patchmix_perm=patchmix_perm,
                                    patchmix_n=patchmix_n)
        logits.append(out)
        for head in self.cascade_heads[1:]:
            out = head(list(feats) + [out], train=train)
            logits.append(out)
        aux = self.aux_logits(feats, train=train)
        return logits[-1], logits[:-1] + aux
