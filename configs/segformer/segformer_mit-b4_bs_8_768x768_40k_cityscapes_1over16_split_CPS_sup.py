# Supervised SegFormer MiT-B4 (reference:
# configs/segformer/segformer_mit-b4_bs_8_768x768_40k_cityscapes_1over16_split_CPS_sup.py
# whose _base_ files were missing — reconstructed)
_base_ = ['./segformer_mit-b4_bs_8_768x768_40k_cityscapes_1over16_split_CPS_semi_MT_w_ours.py']

model = dict(
    ema=False,
    unsup_weight=0.0,
    attn_mask_seperate_head=False,
    adaptive_attn_mask=False,
    use_PatchShuffle_w_Cutmix=False,
    negative_class_ranking=False,
)

data = dict(train=dict(unsup=None))
