# Segmenter mask-transformer base (reference zoo:
# decode_heads/segmenter_mask_head.py:16)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='VisionTransformer', img_size=(512, 512),
                  patch_size=16, embed_dims=768, num_layers=12,
                  num_heads=12, out_indices=(11,)),
    decode_head=dict(
        type='SegmenterMaskTransformerHead', in_channels=768,
        channels=768, num_classes=19, num_layers=2, num_heads=12,
        embed_dims=768, dropout_ratio=0.0, in_index=0,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
