# BiSeNetV1 R18 base (upstream mmseg bisenetv1_r18-d32.py recipe;
# backbone rebuilt at models/backbones/cnn_zoo.py BiSeNetV1)
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='BiSeNetV1',
        in_channels=3,
        context_channels=(128, 256, 512),
        spatial_channels=(64, 64, 64, 128),
        out_indices=(0, 1, 2),
        out_channels=256,
        backbone_cfg=dict(type='ResNet', depth=18),
        norm_cfg=norm_cfg),
    decode_head=dict(
        type='FCNHead', in_channels=256, in_index=0, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, channels=64, num_convs=1,
             num_classes=19, in_index=1, norm_cfg=norm_cfg,
             concat_input=False,
             loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
        dict(type='FCNHead', in_channels=128, channels=64, num_convs=1,
             num_classes=19, in_index=2, norm_cfg=norm_cfg,
             concat_input=False,
             loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    ],
    train_cfg=dict(), test_cfg=dict(mode='whole'))
