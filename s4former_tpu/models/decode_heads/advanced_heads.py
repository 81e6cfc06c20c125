"""Advanced decode heads: DPT, DAFormer, PointRend, K-Net.

Rebuilds of (reference: mmseg/models/decode_heads/): dpt_head.py (294 LoC),
daformer_head.py (190), point_head.py (364), knet_head.py (453) — the four
largest zoo heads. NHWC/flax, fixed shapes: PointRend's uncertainty-based
point selection becomes a top-k over a static oversample; K-Net's kernel
update iterates a static num_stages.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.misc_heads import ConvBNReLU
from s4former_tpu.models.decode_heads.zoo_heads import (_HeadBase,
                                                        _head_fields)
from s4former_tpu.ops.point_sample import point_sample
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import HEADS

Array = jax.Array


# ---------------------------------------------------------------- DPT
class ResidualConvUnit(nn.Module):
    """PreActResidualConvUnit (dpt_head.py:100-148): act-conv-norm x2 +
    skip."""
    channels: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name='conv1')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name='conv2')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn2')(y)
        return x + y


@HEADS.register_module()
@_head_fields
class DPTHead(_HeadBase):
    """(ref dpt_head.py:14-293), exact structure: ReassembleBlocks with
    BIASED 1x1 projects and parametric resize layers (ConvTranspose 4x4
    s4 / 2x2 s2 / identity / 3x3 s2 conv), bias-free no-norm per-level
    convs, FeatureFusionBlocks (block 0 has NO res_conv_unit1; skip
    resized onto the carry with align_corners=False, the x2 upsample
    with align_corners=TRUE, biased 1x1 project), final 3x3 ConvModule.
    readout_type: 'ignore' only (our ViT taps drop the cls token)."""
    in_channels: Union[int, Sequence[int]] = (768, 768, 768, 768)
    channels: int = 256
    num_classes: int = 21
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'
    expand_channels: bool = False
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        if self.readout_type != 'ignore':
            raise NotImplementedError(
                "readout_type 'add'/'project' need the ViT cls token, "
                'which our backbone taps drop (reassemble readout — '
                'disclosed in PARITY.md)')
        feats = [inputs[i] for i in self.in_index]
        ppc = [c * 2 ** i if self.expand_channels else c
               for i, c in enumerate(self.post_process_channels)]
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(ppc[i], (1, 1), name=f'reassemble_{i}')(f)
            if i == 0:
                y = nn.ConvTranspose(ppc[i], (4, 4), strides=(4, 4),
                                     padding='VALID',
                                     name='resize_0')(y)
            elif i == 1:
                y = nn.ConvTranspose(ppc[i], (2, 2), strides=(2, 2),
                                     padding='VALID',
                                     name='resize_1')(y)
            elif i == 3:
                y = nn.Conv(ppc[i], (3, 3), strides=(2, 2), padding=1,
                            name='resize_3')(y)
            outs.append(y)
        outs = [nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                        name=f'convs_{i}')(y) for i, y in enumerate(outs)]
        # FeatureFusionBlocks (ref :150-214 + :271-273): block 0 takes
        # the deepest level with no skip unit
        x = None
        for blk, lvl in enumerate(range(len(outs) - 1, -1, -1)):
            skip = outs[lvl]
            if blk == 0:
                x = skip
            else:
                if x.shape[1:3] != skip.shape[1:3]:
                    skip = resize_bilinear(skip, x.shape[1:3], False)
                x = x + ResidualConvUnit(
                    self.channels, name=f'fusion_{blk}_rcu1')(skip, train)
            x = ResidualConvUnit(self.channels,
                                 name=f'fusion_{blk}_rcu2')(x, train)
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), True)
            x = nn.Conv(self.channels, (1, 1),
                        name=f'fusion_{blk}_project')(x)
        x = ConvBNReLU(self.channels, 3, name='project')(x, train)
        return self._cls(x, train, return_last_feat)


# ------------------------------------------------------------- DAFormer
@HEADS.register_module()
@_head_fields
class DAFormerHead(_HeadBase):
    """(ref daformer_head.py:124-191), exact structure for the canonical
    recipe: per-level embed layers built from ``decoder_params``
    (types 'mlp' = Linear, 'conv'/'sep_conv' ConvModules), resize to the
    finest level, fusion = ASPPWrapper (sep DS-ASPP branches + 3x3
    bottleneck; optional image pool). Unsupported layer types ('isa',
    'rawconv_and_aspp', context_cfg) raise."""
    in_channels: Sequence[int] = (64, 128, 320, 512)
    channels: int = 256
    num_classes: int = 19
    decoder_params: Optional[dict] = None
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'

    def _embed(self, x, i, cfg, dim, train):
        t = cfg['type']
        if t == 'mlp':
            return nn.Dense(dim, name=f'embed_{i}')(x)
        if t == 'conv':
            k = cfg.get('kernel_size', 1)
            return ConvBNReLU(dim, k, name=f'embed_{i}')(x, train)
        if t == 'sep_conv':
            from s4former_tpu.models.decode_heads.zoo_heads import \
                SepConvBNReLU
            k = cfg.get('kernel_size', 3)
            return SepConvBNReLU(dim, k, name=f'embed_{i}')(x, train)
        raise NotImplementedError(
            f"DAFormer embed layer type '{t}' (disclosed in PARITY.md)")

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        from s4former_tpu.models.decode_heads.zoo_heads import SepConvBNReLU
        dp = dict(self.decoder_params or dict(
            embed_dims=256,
            embed_cfg=dict(type='mlp'),
            embed_neck_cfg='same_as_embed_cfg',
            fusion_cfg=dict(type='aspp', sep=True,
                            dilations=(1, 6, 12, 18), pool=False)))
        embed_dims = dp['embed_dims']
        if isinstance(embed_dims, int):
            embed_dims = [embed_dims] * len(self.in_index)
        embed_cfg = dp['embed_cfg']
        embed_neck_cfg = dp.get('embed_neck_cfg', 'same_as_embed_cfg')
        if embed_neck_cfg == 'same_as_embed_cfg':
            embed_neck_cfg = embed_cfg
        fusion_cfg = dict(dp['fusion_cfg'])
        feats = [inputs[i] for i in self.in_index]
        target_hw = feats[0].shape[1:3]
        embeds = []
        for i, f in enumerate(feats):
            cfg = embed_neck_cfg if i == len(feats) - 1 else embed_cfg
            y = self._embed(f, self.in_index[i], cfg, embed_dims[i],
                            train)
            if patchmix_perm is not None and patchmix_n:
                y = unshuffle_feature_map(y, patchmix_perm, patchmix_n)
            if y.shape[1:3] != target_hw:
                y = resize_bilinear(y, target_hw, self.align_corners)
            embeds.append(y)
        x = jnp.concatenate(embeds, -1)
        if fusion_cfg['type'] != 'aspp':
            raise NotImplementedError(
                f"DAFormer fusion type '{fusion_cfg['type']}'")
        branches = []
        if fusion_cfg.get('pool', False):
            pooled = ConvBNReLU(self.channels, 1, name='fuse_pool')(
                jnp.mean(x, axis=(1, 2), keepdims=True), train)
            branches.append(resize_bilinear(
                jnp.broadcast_to(
                    pooled, (x.shape[0], 1, 1, self.channels)),
                target_hw, self.align_corners))
        sep = fusion_cfg.get('sep', True)
        for i, d in enumerate(fusion_cfg.get('dilations', (1, 6, 12, 18))):
            if d == 1 or not sep:
                branches.append(ConvBNReLU(
                    self.channels, 1 if d == 1 else 3, d,
                    name=f'fuse_{i}')(x, train))
            else:
                branches.append(SepConvBNReLU(
                    self.channels, 3, d, name=f'fuse_{i}')(x, train))
        # ASPPWrapper bottleneck is 3x3 (ref daformer_head.py:63-70)
        x = ConvBNReLU(self.channels, 3, name='fuse_bottleneck')(
            jnp.concatenate(branches, -1), train)
        return self._cls(x, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class PointHead(nn.Module):
    """(point_head.py:40-349, PointRend): a CASCADE head refining a prior
    head's logits at uncertain points.

    - ``__call__(inputs)`` (cascade contract: last element = prev logits)
      runs ONE test-time refinement round: upsample prev logits 2x, find
      the ``num_points`` most uncertain pixels, re-classify them with the
      point MLP, scatter back (:211-249 subdivision step).
    - ``point_losses_inputs`` returns (point_logits, point_coords) for the
      train path (:173-209): importance-sampled points, MLP logits; the
      caller samples GT at the same coords for the point CE loss.
    """
    in_channels: Sequence[int] = (256,)
    channels: int = 256
    num_classes: int = 21
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    in_index: Sequence[int] = (0,)
    input_transform: str = 'multiple_select'
    dropout_ratio: float = 0.0
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    def _mlp(self, fine: Array, coarse: Array) -> Array:
        """Point MLP (:123-140): 1d convs over points; coarse logits
        re-concatenated at every layer."""
        x = jnp.concatenate([fine, coarse], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.channels, name=f'fc_{i}')(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], -1)
        return nn.Dense(self.num_classes, name='fc_seg')(x)

    @staticmethod
    def _uncertainty(logits: Array) -> Array:
        """-(top1 - top2) (:26-37): larger = more uncertain."""
        top2 = jax.lax.top_k(logits, 2)[0]
        return top2[..., 1] - top2[..., 0]

    def sample_points_train(self, rng: Array, prev_logits: Array) -> Array:
        """get_points_train (:251-301): oversample k*N random points, keep
        the beta*N most uncertain, fill with (1-beta)*N random."""
        b = prev_logits.shape[0]
        n = self.num_points
        n_sampled = n * self.oversample_ratio
        k1, k2 = jax.random.split(rng)
        coords = jax.random.uniform(k1, (b, n_sampled, 2))
        logits_at = point_sample(prev_logits, coords, self.align_corners)
        unc = self._uncertainty(logits_at)                     # [B, S]
        n_unc = int(self.importance_sample_ratio * n)
        idx = jax.lax.top_k(unc, n_unc)[1]                     # [B, n_unc]
        top = jnp.take_along_axis(coords, idx[..., None], axis=1)
        rand = jax.random.uniform(k2, (b, n - n_unc, 2))
        return jnp.concatenate([top, rand], axis=1)

    def point_logits(self, feats, prev_logits: Array,
                     points: Array) -> Array:
        fine = jnp.concatenate(
            [point_sample(f, points, self.align_corners) for f in feats],
            axis=-1)
        coarse = point_sample(prev_logits, points, self.align_corners)
        return self._mlp(fine, coarse)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False,
                 points: Optional[Array] = None):
        prev_logits = inputs[-1]
        feats = [inputs[i] for i in self.in_index]
        if points is not None:
            # train path: caller supplies importance-sampled coords
            out = self.point_logits(feats, prev_logits, points)
            return (out, points) if return_last_feat else out
        # test-time single subdivision round (:211-249)
        b, h, w, c = prev_logits.shape
        refined = resize_bilinear(prev_logits, (h * 2, w * 2),
                                  self.align_corners)
        hw2 = refined.shape[1] * refined.shape[2]
        n = min(self.num_points, hw2)
        unc = self._uncertainty(refined).reshape(b, hw2)
        idx = jax.lax.top_k(unc, n)[1]                         # [B, n]
        ys = (idx // refined.shape[2]).astype(jnp.float32)
        xs = (idx % refined.shape[2]).astype(jnp.float32)
        coords = jnp.stack([(xs + 0.5) / refined.shape[2],
                            (ys + 0.5) / refined.shape[1]], -1)
        pl = self.point_logits(feats, prev_logits, coords)     # [B, n, K]
        flat = refined.reshape(b, hw2, self.num_classes)
        flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(flat, idx, pl)
        return flat.reshape(refined.shape)


# ----------------------------------------------------------------- K-Net
class KernelUpdator(nn.Module):
    """(knet_head.py:16-141): adaptive kernel update — gated fusion of the
    group feature (mask-pooled) and the kernel feature."""
    channels: int = 256

    @nn.compact
    def __call__(self, update_feat: Array, kernel_feat: Array) -> Array:
        c = self.channels
        # update_feat, kernel_feat: [B, N, C]
        param = nn.Dense(2 * c, name='dynamic_layer')(update_feat)
        param_in, param_out = jnp.split(param, 2, axis=-1)
        input_feats = nn.Dense(2 * c, name='input_layer')(kernel_feat)
        input_in, input_out = jnp.split(input_feats, 2, axis=-1)
        gate_feats = input_in * nn.LayerNorm(name='norm_in')(param_in)
        input_gate = nn.sigmoid(nn.LayerNorm(name='norm_ig')(
            nn.Dense(c, name='input_gate')(gate_feats)))
        update_gate = nn.sigmoid(nn.LayerNorm(name='norm_ug')(
            nn.Dense(c, name='update_gate')(gate_feats)))
        features = (update_gate *
                    nn.LayerNorm(name='norm_uo')(param_out) +
                    input_gate *
                    nn.LayerNorm(name='norm_io')(input_out))
        features = nn.relu(nn.LayerNorm(name='norm_fc')(
            nn.Dense(c, name='fc_layer')(features)))
        return features


class KernelUpdateHead(nn.Module):
    """(knet_head.py:143-393): one K-Net stage — mask-pool group features,
    update kernels, kernel MHA + FFN, predict new masks."""
    channels: int = 256
    num_heads: int = 8
    mask_thr: float = 0.5

    @nn.compact
    def __call__(self, feats: Array, kernels: Array, masks: Array,
                 train: bool = False):
        b, h, w, c = feats.shape
        n = kernels.shape[1]
        # hard-assign group features (knet_head.py:300-318)
        gates = (jax.nn.sigmoid(masks) > self.mask_thr).astype(feats.dtype)
        group = jnp.einsum('bhwn,bhwc->bnc', gates, feats)
        kernels = KernelUpdator(self.channels, name='updator')(
            group, kernels)
        # kernel interaction: MHA over the N kernels + FFN
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name='attn')(kernels, kernels)
        kernels = nn.LayerNorm(name='attn_norm')(kernels + attn)
        y = nn.Dense(4 * self.channels, name='ffn1')(kernels)
        y = nn.Dense(self.channels, name='ffn2')(nn.relu(y))
        kernels = nn.LayerNorm(name='ffn_norm')(kernels + y)
        # mask head: new masks = <kernel, pixel features>
        k = nn.Dense(self.channels, name='mask_fc')(kernels)
        new_masks = jnp.einsum('bnc,bhwc->bhwn', k, feats)
        return kernels, new_masks


@HEADS.register_module()
@_head_fields
class IterativeDecodeHead(_HeadBase):
    """(knet_head.py:395-453, K-Net): a kernel-generate head (FCN-style)
    produces seg kernels + initial masks; ``num_stages`` KernelUpdateHeads
    refine them. For semantic seg the N kernels ARE the classes, so the
    final masks are the logits."""
    in_channels: int = 512
    channels: int = 256
    num_classes: int = 21
    num_stages: int = 3
    num_heads: int = 8
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        feats = ConvBNReLU(self.channels, 3, name='kernel_generate')(
            x, train)
        masks = nn.Conv(self.num_classes, (1, 1), name='init_seg')(feats)
        kernels = self.param(
            'kernels', nn.initializers.normal(0.02),
            (1, self.num_classes, self.channels))
        kernels = jnp.broadcast_to(
            kernels, (x.shape[0], self.num_classes, self.channels))
        for i in range(self.num_stages):
            kernels, masks = KernelUpdateHead(
                self.channels, self.num_heads, name=f'stage_{i}')(
                    feats, kernels, masks, train)
        logits = masks.astype(jnp.float32)
        return (logits, feats) if return_last_feat else logits
