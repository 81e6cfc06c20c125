# Held-out fixture regime ablation, leg 2/3: MEAN-TEACHER baseline
# (EMA teacher + confidence-thresholded pseudo-labels, NO paper extras).
# Same zero-overlap split as setr_fixture_heldout_sup.py.
_base_ = [
    './setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_semi_beta_1_th_0.95_MT.py',
]

data_root = 'data/fixtures/voc_mini'
fixture_ann = 'SegmentationClass'

model = dict(
    # see setr_fixture_voc_mini_fullflag.py: random-init teachers never
    # clear th=0.95 inside a short budget; 0.35 + momentum 0.99 makes the
    # unsup branch demonstrably live within this run
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
