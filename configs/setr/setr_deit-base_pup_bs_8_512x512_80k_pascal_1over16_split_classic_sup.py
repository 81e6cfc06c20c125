# Supervised-only SETR DeiT-B PUP (reference:
# configs/setr/setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_sup.py)
_base_ = [
    '../_base_/models/setr_pup.py',
    '../_base_/datasets/pascal_voc12_aug_1over16_split_classic_semi.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k_pascal_1over8.py',
]

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
norm_cfg = dict(type='SyncBN', requires_grad=True)
backbone_norm_cfg = dict(type='LN', eps=1e-6, requires_grad=True)
crop_size = (512, 512)

labeled_ratio = 1 / 16
split = 'classic'
samples_per_gpu = 8
workers_per_gpu = 4

backbone = dict(
    type='VisionTransformer',
    img_size=crop_size,
    patch_size=16,
    in_channels=3,
    norm_cfg=backbone_norm_cfg,
    with_cls_token=True,
    interpolate_mode='bilinear',
    drop_rate=0.,
    embed_dims=768,
    num_heads=12,
    num_layers=12,
    out_indices=(4, 7, 9, 11),
    # flagship compute dtype: bf16 activations (params stay f32) — the
    # MXU's native rate and half the HBM traffic (BENCH_NOTES.md); the
    # flash kernel's f32 bwd tiles also exceed the scoped-VMEM budget at
    # L=1025+pad, so f32 training requires use_flash=False
    dtype='bfloat16',
    # FULL scan unroll: params stay stacked but XLA sees straight-line
    # layers — measured 37.6 -> 41.4 img/s on the full semi step (partial
    # unroll regresses; BENCH_NOTES round 4)
    scan_unroll=12,
    init_cfg=dict(type='Pretrained', checkpoint='pretrain/deit_base_p16.pth'))

decode_head = dict(
    type='SETRUPHead',
    dtype='bfloat16',
    align_corners=False,
    num_convs=4,
    in_channels=768,
    num_classes=21,
    channels=256,
    in_index=3,
    dropout_ratio=0,
    norm_cfg=norm_cfg,
    up_scale=2,
    kernel_size=3,
    loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                     loss_weight=1.0))

auxiliary_head = [
    dict(
        type='SETRUPHead',
        dtype='bfloat16',
        in_channels=768,
        channels=256,
        in_index=i,
        num_classes=21,
        dropout_ratio=0,
        norm_cfg=norm_cfg,
        num_convs=2,
        up_scale=4,
        kernel_size=3,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4))
    for i in range(4)
]

model = dict(
    _delete_=True,
    type='EncoderDecoder',
    pretrained=None,
    backbone=backbone,
    decode_head=decode_head,
    auxiliary_head=auxiliary_head,
    test_cfg=dict(mode='whole'),
)

optimizer = dict(
    lr=0.001,
    weight_decay=0.0,
    paramwise_cfg=dict(custom_keys={'head': dict(lr_mult=10.)}))

data = dict(
    samples_per_gpu=samples_per_gpu,
    workers_per_gpu=workers_per_gpu,
    train=dict(
        unsup=None,  # supervised-only: no unlabeled stream
    ))
