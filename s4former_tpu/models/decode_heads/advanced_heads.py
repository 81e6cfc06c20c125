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
    """(ref knet_head.py:16-140), exact structure: dynamic/input Linear
    splits into in/out halves, gated fusion with LN-normalized gates,
    fc_layer + fc_norm + ReLU. Coherent only when in_channels ==
    feat_channels (the shipped mmseg configs; asserted)."""
    in_channels: int = 256
    feat_channels: int = 256
    out_channels: Optional[int] = None
    gate_sigmoid: bool = True
    gate_norm_act: bool = False
    activate_out: bool = False

    @nn.compact
    def __call__(self, update_feature: Array,
                 input_feature: Array) -> Array:
        # update_feature [P, C]; input_feature [P, K*K, C]
        c = self.feat_channels
        assert self.in_channels == c, (
            'KernelUpdator is only coherent with in_channels == '
            'feat_channels (as in every shipped mmseg K-Net config)')
        out_c = self.out_channels or self.in_channels
        params = nn.Dense(2 * c, name='dynamic_layer')(update_feature)
        param_in, param_out = params[:, :c], params[:, c:]
        input_feats = nn.Dense(2 * c, name='input_layer')(input_feature)
        input_in = input_feats[..., :c]
        input_out = input_feats[..., c:]
        gate_feats = input_in * param_in[:, None]
        if self.gate_norm_act:
            gate_feats = nn.relu(nn.LayerNorm(name='gate_norm')(gate_feats))
        input_gate = nn.LayerNorm(name='input_norm_in')(
            nn.Dense(c, name='input_gate')(gate_feats))
        update_gate = nn.LayerNorm(name='norm_in')(
            nn.Dense(c, name='update_gate')(gate_feats))
        if self.gate_sigmoid:
            input_gate = nn.sigmoid(input_gate)
            update_gate = nn.sigmoid(update_gate)
        param_out = nn.LayerNorm(name='norm_out')(param_out)
        input_out = nn.LayerNorm(name='input_norm_out')(input_out)
        if self.activate_out:
            param_out = nn.relu(param_out)
            input_out = nn.relu(input_out)
        features = update_gate * param_out[:, None] + \
            input_gate * input_out
        features = nn.LayerNorm(name='fc_norm')(
            nn.Dense(out_c, name='fc_layer')(features))
        return nn.relu(features)


class KernelUpdateHead(nn.Module):
    """(ref knet_head.py:143-393), exact structure for the shipped
    semantic configs (conv_kernel_size=1, strides 1): softmax-over-
    proposals mask pooling, KernelUpdator, torch-style MHA over the
    proposal axis + LN, mmcv FFN (residual) + LN, num_mask_fcs x
    [bias-free Linear, LN, ReLU], fc_mask, per-proposal dynamic 1x1
    "conv" as an einsum."""
    in_channels: int = 256
    out_channels: int = 256
    num_heads: int = 8
    num_mask_fcs: int = 3
    feedforward_channels: int = 2048
    conv_kernel_size: int = 1
    with_ffn: bool = True
    feat_transform: bool = True
    kernel_updator_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, feats: Array, kernels: Array, masks: Array,
                 train: bool = False):
        # feats [B,H,W,C]; kernels [B,np,C] (K=1); masks [B,H',W',np]
        if self.conv_kernel_size != 1:
            raise NotImplementedError(
                'conv_kernel_size > 1 (every shipped mmseg semantic '
                'K-Net config uses 1; disclosed in PARITY.md)')
        c = self.in_channels
        b, h, w, _ = feats.shape
        np_ = kernels.shape[1]
        x = feats
        if self.feat_transform:
            x = nn.Conv(c, (1, 1), name='feat_transform')(x)
        gm = masks
        if gm.shape[1:3] != (h, w):
            gm = resize_bilinear(gm, (h, w), False)
        sigmoid_masks = jax.nn.softmax(gm, axis=-1)   # over proposals
        x_feat = jnp.einsum('bhwn,bhwc->bnc', sigmoid_masks, x)
        ku_cfg = dict(self.kernel_updator_cfg or dict(
            in_channels=c, feat_channels=c, out_channels=c))
        ku_cfg.pop('type', None)
        ku_cfg.pop('norm_cfg', None)
        ku_cfg.pop('act_cfg', None)
        obj = KernelUpdator(name='kernel_update_conv', **ku_cfg)(
            x_feat.reshape(b * np_, c), kernels.reshape(b * np_, 1, c))
        obj = obj.reshape(b, np_, c)
        # torch nn.MultiheadAttention over the proposal axis
        e = c * self.conv_kernel_size ** 2
        qkv = nn.Dense(3 * e, name='attn_qkv')(obj)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = e // self.num_heads
        q = q.reshape(b, np_, self.num_heads, hd)
        k = k.reshape(b, np_, self.num_heads, hd)
        v = v.reshape(b, np_, self.num_heads, hd)
        a = jax.nn.softmax(
            jnp.einsum('bqnc,bknc->bnqk', q, k) * hd ** -0.5, -1)
        att = jnp.einsum('bnqk,bknc->bqnc', a, v).reshape(b, np_, e)
        att = nn.Dense(e, name='attn_out')(att)
        obj = nn.LayerNorm(name='attention_norm')(obj + att)
        if self.with_ffn:
            y = nn.Dense(self.feedforward_channels, name='ffn_fc1')(obj)
            y = nn.Dense(c, name='ffn_fc2')(nn.relu(y))
            obj = nn.LayerNorm(name='ffn_norm')(obj + y)
        mask_feat = obj
        for j in range(self.num_mask_fcs):
            mask_feat = nn.Dense(c, use_bias=False,
                                 name=f'mask_fc_{j}')(mask_feat)
            mask_feat = nn.relu(nn.LayerNorm(name=f'mask_ln_{j}')(
                mask_feat))
        mask_feat = nn.Dense(self.out_channels, name='fc_mask')(mask_feat)
        # per-proposal dynamic 1x1 conv == einsum for K=1
        new_masks = jnp.einsum('bhwc,bnc->bhwn', x, mask_feat)
        return obj, new_masks


@HEADS.register_module()
@_head_fields
class IterativeDecodeHead(_HeadBase):
    """(ref knet_head.py:395-453), exact structure: the kernel-generate
    head (ANY registered head; its conv_seg WEIGHT seeds the kernels)
    produces feats + initial masks; ``num_stages`` KernelUpdateHeads
    refine kernels and masks. Returns the LAST stage's masks as logits;
    intermediate stage logits are exposed via
    ``sow('intermediates', 'stage_segs')`` (the reference's per-stage
    losses are not wired into the semi train step — disclosed)."""
    in_channels: Union[int, Sequence[int]] = 512
    channels: int = 256
    num_classes: int = 21
    num_stages: int = 3
    kernel_generate_head: Optional[dict] = None
    kernel_update_head: Optional[Sequence[dict]] = None
    num_heads: int = 8  # legacy fallback when kernel_update_head is None
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        gen_cfg = dict(self.kernel_generate_head or dict(
            type='FCNHead', in_channels=self.in_channels,
            channels=self.channels, num_classes=self.num_classes,
            num_convs=1, concat_input=False, in_index=self.in_index,
            dropout_ratio=0))
        gen = HEADS.build(dict(gen_cfg, name='kernel_generate_head'))
        sem_seg, feats = gen(inputs, train=train,
                             patchmix_perm=patchmix_perm,
                             patchmix_n=patchmix_n, return_last_feat=True)
        # seg kernels = the generate head's conv_seg weight
        # (ref :440-443); flax kernel [1, 1, C, ncls] -> [B, ncls, C]
        w = gen.variables['params']['conv_seg']['kernel']
        kernels = jnp.broadcast_to(
            w[0, 0].T[None], (feats.shape[0], w.shape[-1], w.shape[2]))
        update_cfgs = self.kernel_update_head or [
            dict(in_channels=self.channels, out_channels=self.channels,
                 num_heads=self.num_heads,
                 feedforward_channels=4 * self.channels)
        ] * self.num_stages
        masks = sem_seg
        stage_segs = [sem_seg]
        for i in range(self.num_stages):
            cfg = dict(update_cfgs[i if i < len(update_cfgs) else -1])
            cfg.pop('type', None)
            for drop in ('num_classes', 'num_ffn_fcs', 'act_cfg',
                         'ffn_act_cfg', 'dropout', 'feat_gather_stride',
                         'mask_transform_stride', 'kernel_init',
                         'feat_transform_cfg'):
                cfg.pop(drop, None)
            kernels, masks = KernelUpdateHead(
                name=f'kernel_update_head_{i}', **cfg)(
                    feats, kernels, masks, train)
            stage_segs.append(masks)
        self.sow('intermediates', 'stage_segs', tuple(stage_segs))
        logits = masks.astype(jnp.float32)
        return (logits, feats) if return_last_feat else logits
