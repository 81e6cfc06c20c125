# Held-out fixture regime ablation, leg 1/3: SUPERVISED ONLY (round 5,
# VERDICT r4 next #3). Mirrors the reference regime triplet
# (/root/reference/configs/setr/: *_sup.py vs *_MT.py vs *_MT_w_ours.py,
# SURVEY §0) at fixture geometry with a ZERO-OVERLAP split:
#   sup   = photo_00000(+f), photo_00001(+f)          (4 images)
#   unsup = photo_00003/00004/color/demo_l/demo_r(+f) (10, unused here)
#   val   = photo_00002(+f)                           (2 held-out,
#                                                      human-labeled)
# Whole base-image pairs move together so no flip variant of a val image
# ever appears in training.
_base_ = [
    './setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_sup.py',
]

data_root = 'data/fixtures/voc_mini'
fixture_ann = 'SegmentationClass'

data = dict(
    train=dict(
        sup=dict(
            data_root=data_root,
            ann_dir=fixture_ann,
            split='datasplits/heldout/train_supervised.txt',
        ),
        unsup=None),  # supervised-only: no unlabeled stream
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
