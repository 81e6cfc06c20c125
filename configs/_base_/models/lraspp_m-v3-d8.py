# LRASPP MobileNetV3-Large base (upstream mmseg lraspp_m-v3-d8.py
# recipe; backbone rebuilt at models/backbones/mobilenet.py MobileNetV3)
norm_cfg = dict(type='SyncBN', eps=0.001, requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='MobileNetV3', arch='large',
                  out_indices=(1, 3, 16), norm_cfg=norm_cfg),
    decode_head=dict(
        type='LRASPPHead', in_channels=(16, 24, 960), in_index=(0, 1, 2),
        channels=128, input_transform='multiple_select',
        branch_channels=(32, 64), dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
