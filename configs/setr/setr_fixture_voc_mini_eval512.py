# Fixed-geometry offline eval of the fixture run: test at the TRAINED
# 512x512 geometry (keep_ratio=False). The training config's standard VOC
# test pipeline evaluates at keep-ratio (2048,512) — a resolution the
# from-scratch model never saw (the reference's models inherit resolution
# robustness from DeiT pretraining, which isn't shipped here); memorization
# evidence belongs at the trained scale.
_base_ = ['./setr_fixture_voc_mini_fullflag.py']

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(512, 512),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=False),
            dict(type='RandomFlip'),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])
]

data = dict(
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
