# Keep-ratio (2048,512) eval of the fixture set — the standard VOC test
# geometry. Used by tools/measure_eval_divergence.py on a trained fixture
# checkpoint: images land at non-bucket-multiple shapes (500x375 ->
# 683x512), so the pad-to-bucket-and-slice device path genuinely diverges
# from exact-shape inference here (at the trained 512x512 geometry the
# padding is a no-op). Reference exact-shape inference:
# mmseg/models/segmentors/encoder_decoder.py:1118-1172.
_base_ = ['./setr_fixture_voc_mini_fullflag.py']

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

keepratio_test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(2048, 512),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])
]

data = dict(
    val=dict(pipeline=keepratio_test_pipeline),
    test=dict(pipeline=keepratio_test_pipeline),
)
