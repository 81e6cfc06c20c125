# Mean-Teacher baseline (reference:
# configs/setr/..._semi_beta_1_th_0.95_MT.py).
# NOTE documented divergence: the reference MT path computes NO unsup loss
# (compute_pseudo_loss is dead code unless PASA/fdrop flags are set,
# encoder_decoder.py:681-687); this config trains a REAL mean teacher with
# the plain confidence-thresholded pseudo-CE loss.
_base_ = ['./setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_sup.py']

use_EMA = True
ema_momentum = 0.999
beta = 1.0
thres = 0.95

samples_per_gpu_sup = 4
samples_per_gpu_unsup = 4
samples_per_gpu = samples_per_gpu_sup + samples_per_gpu_unsup

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (512, 512)
img_scale = (2048, 512)

strong_pipeline = [
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='ExtraAttrs', tag='unsup_student'),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
weak_pipeline = [
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='ExtraAttrs', tag='unsup_teacher'),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
unsup_train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=img_scale, ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.75),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='MultiBranch', unsup_student=strong_pipeline,
         unsup_teacher=weak_pipeline),
]

model = dict(
    ema=use_EMA,
    ema_momentum=ema_momentum,
    unsup_weight=beta,
    unsup_confidence=thres,
)

data = dict(
    samples_per_gpu=samples_per_gpu,
    train=dict(
        unsup=dict(
            type='PascalVOCDataset',
            data_root='data/VOCdevkit/VOC2012',
            img_dir='JPEGImages',
            ann_dir='SegmentationClassAug',
            pipeline=unsup_train_pipeline,
            split='datasplits/voc_split_U2PL/92_train_unsupervised.txt',
        )))
