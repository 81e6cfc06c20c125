# S4Former full (reference: configs/setr/..._MT_w_ours.py:236-262):
# MT + PASA (separate head, weight 5, adaptive) + PatchShuffle-with-CutMix
# (N=8) + NCR (unsup_only), lr 0.001 wd 0 head x10.
_base_ = ['./setr_deit-base_pup_bs_8_512x512_80k_pascal_1over16_split_classic_semi_beta_1_th_0.95_MT.py']

PatchMix_N = 8

model = dict(
    attn_mask_seperate_head=True,
    attn_mask_weight=5,
    adaptive_attn_mask=True,
    use_PatchShuffle_w_Cutmix=True,
    PatchMix_N=PatchMix_N,
    negative_class_ranking=True,
    negative_class_ranking_mode='unsup_only',
)
