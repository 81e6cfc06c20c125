"""Checkpoint ingestion parity.

Validates the torch->flax weight mapping (reference recipe README.md:42-76)
at the layer level: torch ``nn.MultiheadAttention`` with random weights vs
our ``MultiheadSelfAttention`` loaded through the converter must produce
identical outputs. Also round-trips a synthetic full ViT state_dict.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          convert_vit_backbone,
                                          merge_pretrained)
from s4former_tpu.models.backbones.vit import MultiheadSelfAttention


def test_attention_weight_mapping_matches_torch():
    c, h, b, l = 32, 4, 2, 9
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    x = torch.randn(b, l, c)
    with torch.no_grad():
        ref, _ = mha(x, x, x, need_weights=False)

    sd = {f'attn.attn.{k}': v.detach().numpy()
          for k, v in mha.state_dict().items()}
    params = {
        'qkv': {'kernel': sd['attn.attn.in_proj_weight'].T,
                'bias': sd['attn.attn.in_proj_bias']},
        'proj': {'kernel': sd['attn.attn.out_proj.weight'].T,
                 'bias': sd['attn.attn.out_proj.bias']},
    }
    module = MultiheadSelfAttention(embed_dims=c, num_heads=h,
                                    use_flash=False)
    out, _ = module.apply({'params': params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def _fake_vit_sd(num_layers=2, c=32, grid=4):
    rng = np.random.RandomState(0)
    sd = {
        'backbone.cls_token': rng.randn(1, 1, c).astype(np.float32),
        'backbone.pos_embed': rng.randn(1, grid * grid + 1,
                                        c).astype(np.float32),
        'backbone.patch_embed.projection.weight':
            rng.randn(c, 3, 16, 16).astype(np.float32),
        'backbone.patch_embed.projection.bias':
            rng.randn(c).astype(np.float32),
    }
    for i in range(num_layers):
        p = f'backbone.layers.{i}.'
        sd[p + 'ln1.weight'] = rng.randn(c).astype(np.float32)
        sd[p + 'ln1.bias'] = rng.randn(c).astype(np.float32)
        sd[p + 'ln2.weight'] = rng.randn(c).astype(np.float32)
        sd[p + 'ln2.bias'] = rng.randn(c).astype(np.float32)
        sd[p + 'attn.attn.in_proj_weight'] = rng.randn(
            3 * c, c).astype(np.float32)
        sd[p + 'attn.attn.in_proj_bias'] = rng.randn(
            3 * c).astype(np.float32)
        sd[p + 'attn.attn.out_proj.weight'] = rng.randn(
            c, c).astype(np.float32)
        sd[p + 'attn.attn.out_proj.bias'] = rng.randn(c).astype(np.float32)
        sd[p + 'ffn.layers.0.0.weight'] = rng.randn(
            4 * c, c).astype(np.float32)
        sd[p + 'ffn.layers.0.0.bias'] = rng.randn(4 * c).astype(np.float32)
        sd[p + 'ffn.layers.1.weight'] = rng.randn(
            c, 4 * c).astype(np.float32)
        sd[p + 'ffn.layers.1.bias'] = rng.randn(c).astype(np.float32)
    return sd


def test_convert_full_checkpoint_and_merge():
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.models import (build_segmentor,
                                     init_segmentor_variables)

    sd = _fake_vit_sd()
    # add a decode head (SETRUP layout)
    rng = np.random.RandomState(1)
    sd.update({
        'decode_head.norm.weight': rng.randn(32).astype(np.float32),
        'decode_head.norm.bias': rng.randn(32).astype(np.float32),
        'decode_head.up_convs.0.0.conv.weight':
            rng.randn(16, 32, 3, 3).astype(np.float32),
        'decode_head.up_convs.0.0.bn.weight':
            rng.randn(16).astype(np.float32),
        'decode_head.up_convs.0.0.bn.bias':
            rng.randn(16).astype(np.float32),
        'decode_head.up_convs.0.0.bn.running_mean':
            rng.randn(16).astype(np.float32),
        'decode_head.up_convs.0.0.bn.running_var':
            np.abs(rng.randn(16)).astype(np.float32),
        'decode_head.conv_seg.weight':
            rng.randn(5, 16, 1, 1).astype(np.float32),
        'decode_head.conv_seg.bias': rng.randn(5).astype(np.float32),
    })
    converted = convert_mmseg_checkpoint(sd, num_layers=2, dst_grid=(4, 4))
    assert 'backbone_m' in converted['params']
    assert converted['params']['backbone_m']['patch_embed'][
        'kernel'].shape == (16, 16, 3, 32)
    assert converted['params']['decode_head_m']['up_convs_0']['conv'][
        'kernel'].shape == (3, 3, 32, 16)
    assert converted['batch_stats']['decode_head_m']['up_convs_0']['bn'][
        'mean'].shape == (16,)

    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(1,), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=5, in_index=0, num_convs=1,
                         up_scale=4)))
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 64, 64, 3))
    merged = merge_pretrained(variables, converted)
    got = np.asarray(
        merged['params']['backbone_m']['layers']['block']['attn']['qkv'][
            'kernel'])
    np.testing.assert_allclose(
        got[0], sd['backbone.layers.0.attn.attn.in_proj_weight'].T)
    np.testing.assert_allclose(
        got[1], sd['backbone.layers.1.attn.attn.in_proj_weight'].T)
    # merged variables still drive a forward
    logits = model.apply(merged, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_pos_embed_resize_on_load():
    sd = _fake_vit_sd(grid=4)
    out = convert_vit_backbone(
        {k[len('backbone.'):]: v for k, v in sd.items()
         if k.startswith('backbone.')}, num_layers=2, dst_grid=(8, 8))[0]
    assert out['pos_embed'].shape == (1, 65, 32)


def test_export_roundtrip_reference_state_dict(tmp_path):
    """convert(export(v)) == v: our variables survive a trip through the
    reference torch layout (SURVEY §7 'checkpoint compat both
    directions'), including the torch.save file format."""
    import jax
    import numpy as np
    from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                              export_reference_state_dict,
                                              load_torch_state_dict)
    from s4former_tpu.models import (build_segmentor,
                                     init_segmentor_variables)
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(0, 1), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=5, in_index=1, num_convs=2,
                         up_scale=2),
        auxiliary_head=[
            dict(type='SETRUPHead', in_channels=32, channels=16,
                 num_classes=5, in_index=0, num_convs=1, up_scale=4)
            for _ in range(2)]))
    v = init_segmentor_variables(model, jax.random.PRNGKey(3), (1, 64, 64, 3))
    path = str(tmp_path / 'export.pth')
    export_reference_state_dict(v, path)
    sd = load_torch_state_dict(path)
    assert 'backbone.layers.1.ffn.layers.1.weight' in sd
    assert 'auxiliary_head.1.conv_seg.weight' in sd
    back = convert_mmseg_checkpoint(sd, num_layers=2, num_aux=2)

    flat_orig = jax.tree_util.tree_flatten_with_path(
        {'params': v['params'], 'batch_stats': v['batch_stats']})[0]
    orig = {jax.tree_util.keystr(k): np.asarray(x) for k, x in flat_orig}
    flat_back = jax.tree_util.tree_flatten_with_path(back)[0]
    n_checked = 0
    for k, x in flat_back:
        ks = jax.tree_util.keystr(k)
        if 'aux_heads_' in ks:  # unstacked duplicate layout, skip
            continue
        assert ks in orig, ks
        np.testing.assert_array_equal(np.asarray(x), orig[ks], err_msg=ks)
        n_checked += 1
    assert n_checked > 30  # backbone + head + stacked aux all covered
