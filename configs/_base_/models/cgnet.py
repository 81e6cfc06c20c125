# CGNet base (upstream mmseg cgnet.py recipe; backbone rebuilt at
# models/backbones/cnn_zoo.py CGNet)
norm_cfg = dict(type='SyncBN', eps=1e-03, requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='CGNet', norm_cfg=norm_cfg, in_channels=3,
                  num_channels=(32, 64, 128), num_blocks=(3, 21),
                  dilations=(2, 4), reductions=(8, 16)),
    decode_head=dict(
        type='FCNHead', in_channels=256, in_index=2, channels=256,
        num_convs=0, concat_input=False, dropout_ratio=0,
        num_classes=19, norm_cfg=norm_cfg,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
