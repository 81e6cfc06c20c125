# SegFormer MiT-B4 Cityscapes semi config (reference shipped only the sup
# variant with MISSING _base_ files — reconstructed here, S4Former-wired)
_base_ = [
    '../_base_/models/segformer_mit-b0.py',
    '../_base_/datasets/cityscapes_768x768_1over16_split_CPS_semi.py',
    '../_base_/default_runtime.py',
]

crop_size = (768, 768)

model = dict(
    backbone=dict(
        embed_dims=64,
        num_layers=[3, 8, 27, 3]),
    decode_head=dict(
        in_channels=[64, 128, 320, 512],
        num_classes=19),
    # semi flags (PASA patch 8 for MiT, encoder_decoder.py:548-553)
    ema=True,
    ema_momentum=0.999,
    unsup_weight=1.0,
    unsup_confidence=0.95,
    attn_mask_seperate_head=True,
    attn_mask_weight=5,
    adaptive_attn_mask=True,
    use_PatchShuffle_w_Cutmix=True,
    PatchMix_N=8,
    negative_class_ranking=True,
    negative_class_ranking_mode='unsup_only',
    test_cfg=dict(mode='slide', crop_size=(768, 768), stride=(512, 512)),
)

optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0,
                 paramwise_cfg=dict(custom_keys={'head': dict(lr_mult=10.)}))
optimizer_config = dict()
lr_config = dict(policy='poly', power=0.9, min_lr=1e-4, by_epoch=False)
runner = dict(type='IterBasedRunner', max_iters=40001)
checkpoint_config = dict(by_epoch=False, interval=4000)
evaluation = dict(interval=2000, metric='mIoU', pre_eval=True)
samples_per_gpu_sup = 4
samples_per_gpu_unsup = 4
