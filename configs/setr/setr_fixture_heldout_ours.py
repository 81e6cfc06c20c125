# Held-out fixture regime ablation, leg 3/3: FULL S4FORMER (MT + PASA +
# PatchShuffle/CutMix + NCR — the paper's contributions, exactly the
# reference's *_MT_w_ours.py flag diff, SURVEY §0).
# Same zero-overlap split as setr_fixture_heldout_sup.py.
_base_ = [
    './setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_semi_beta_1_th_0.95_MT_w_ours.py',
]

data_root = 'data/fixtures/voc_mini'
fixture_ann = 'SegmentationClass'

model = dict(
    unsup_confidence=0.35,
    ema_momentum=0.99,
)

data = dict(
    train=dict(
        sup=dict(
            data_root=data_root,
            ann_dir=fixture_ann,
            split='datasplits/heldout/train_supervised.txt',
        ),
        unsup=dict(
            data_root=data_root,
            ann_dir=fixture_ann,
            split='datasplits/heldout/train_unsupervised.txt',
        )),
    val=dict(
        data_root=data_root,
        ann_dir=fixture_ann,
        split='datasplits/heldout/val.txt',
    ),
    test=dict(
        data_root=data_root,
        ann_dir=fixture_ann,
        split='datasplits/heldout/val.txt',
    ))

runner = dict(max_iters=1501)
evaluation = dict(interval=250, metric='mIoU', pre_eval=True)
checkpoint_config = dict(by_epoch=False, interval=500)
log_config = dict(interval=25)
