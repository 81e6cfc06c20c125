# Real-image end-to-end fixture run: the FULL S4Former flag set (PASA +
# PatchShuffle/CutMix + NCR + EMA) on the 20-image photographic VOC-layout
# fixture dataset (tools/make_fixture_dataset.py). Overfit evidence: mIoU
# on the train fixtures must rise toward ~1.0; unsup losses are live from
# early on thanks to the lowered confidence threshold.
# Mirrors the reference training contract (mmseg/apis/train.py:70-269 +
# configs/setr/..._MT_w_ours.py) at a 1k-iter budget.
_base_ = [
    './setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_semi_beta_1_th_0.95_MT_w_ours.py',
]

data_root = 'data/fixtures/voc_mini'
fixture_ann = 'SegmentationClass'

model = dict(
    # random-init teacher never clears 0.95; and at momentum 0.999 the
    # teacher would still be ~0.999^1000 = 37% random-weight blend at the
    # end of this 1k-iter budget — 0.99 makes it track the (overfitting)
    # student within ~500 iters so the unsup branch demonstrably fires
    unsup_confidence=0.35,
    ema_momentum=0.99,
)

# Eval geometry (measured round 4, r3 checkpoint): the default keep-ratio
# (2048,512) pipeline scores 0.630 (bucketed) / 0.550 (exact); the
# "trained-geometry" 512x512 keep_ratio=False hypothesis from round 3
# scores WORSE (0.552) — the aspect distortion costs more than the
# resolution match gains, because training content is keep-ratio-scaled
# 512 crops. In-loop eval therefore stays on the base keep-ratio
# pipeline; setr_fixture_voc_mini_eval512.py remains for the offline
# comparison and tools/measure_eval_divergence.py quantifies the
# pad-vs-exact delta (BENCH_NOTES round-4 section).
data = dict(
    train=dict(
        sup=dict(
            data_root=data_root,
            ann_dir=fixture_ann,
            split='datasplits/fixture/train_supervised.txt',
        ),
        unsup=dict(
            data_root=data_root,
            ann_dir=fixture_ann,
            split='datasplits/fixture/train_unsupervised.txt',
        )),
    val=dict(
        data_root=data_root,
        ann_dir=fixture_ann,
        split='datasplits/fixture/val.txt',
    ),
    test=dict(
        data_root=data_root,
        ann_dir=fixture_ann,
        split='datasplits/fixture/val.txt',
    ))

runner = dict(max_iters=1001)
evaluation = dict(interval=200, metric='mIoU', pre_eval=True)
checkpoint_config = dict(by_epoch=False, interval=250)
log_config = dict(interval=25)
