# Tiny-geometry smoke variant of the fixture run: the FULL S4Former flag
# set (PASA + PatchShuffle/CutMix + NCR + EMA) on a 2-layer/96-dim ViT so
# the end-to-end train/eval loop runs in CPU-minutes. Used by the tutorial
# notebook (demo/S4Former_TPU_Tutorial.ipynb) and as a fast sanity config;
# learning evidence lives in setr_fixture_voc_mini_fullflag.py (full
# DeiT-B geometry).
_base_ = ['./setr_fixture_voc_mini_fullflag.py']

model = dict(
    backbone=dict(
        embed_dims=96,
        num_heads=3,
        num_layers=2,
        out_indices=(0, 1),
    ),
    decode_head=dict(
        in_channels=96,
        in_index=1,
    ),
    # list values replace wholesale under _base_ merge (mmcv semantics):
    # two aux heads, one per out_index, same shape as the flagship's four.
    auxiliary_head=[
        dict(
            type='SETRUPHead',
            dtype='bfloat16',
            in_channels=96,
            channels=256,
            in_index=i,
            num_classes=21,
            dropout_ratio=0,
            norm_cfg=dict(type='SyncBN', requires_grad=True),
            num_convs=2,
            up_scale=4,
            kernel_size=3,
            align_corners=False,
            loss_decode=dict(
                type='CrossEntropyLoss', use_sigmoid=False, loss_weight=0.4),
        ) for i in range(2)
    ],
)

runner = dict(max_iters=21)
evaluation = dict(interval=10, metric='mIoU', pre_eval=True)
checkpoint_config = dict(by_epoch=False, interval=10)
log_config = dict(interval=5)
