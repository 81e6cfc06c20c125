"""Config system tests (mmcv-parity semantics: _base_, _delete_, cfg-options)."""
import os.path as osp
import tempfile
import textwrap

from s4former_tpu.config import Config, DictAction, merge_dict


def _write(tmpdir, name, content):
    path = osp.join(tmpdir, name)
    with open(path, 'w') as f:
        f.write(textwrap.dedent(content))
    return path


def test_base_inheritance_and_override():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'base.py', """
            model = dict(type='EncoderDecoder',
                         backbone=dict(type='ViT', depth=24, heads=16))
            lr = 0.01
        """)
        child = _write(d, 'child.py', """
            _base_ = ['base.py']
            model = dict(backbone=dict(depth=12))
            lr = 0.001
        """)
        cfg = Config.fromfile(child)
        assert cfg.model.backbone.depth == 12
        assert cfg.model.backbone.heads == 16  # inherited through deep merge
        assert cfg.model.type == 'EncoderDecoder'
        assert cfg.lr == 0.001


def test_delete_semantics():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'base.py', "head = dict(type='A', channels=64, extra=1)\n")
        child = _write(d, 'child.py', """
            _base_ = ['base.py']
            head = dict(_delete_=True, type='B', channels=32)
        """)
        cfg = Config.fromfile(child)
        assert cfg.head.type == 'B'
        assert 'extra' not in cfg.head


def test_merge_from_dict_dotted():
    cfg = Config({'model': {'backbone': {'depth': 12}}, 'lr': 0.1})
    cfg.merge_from_dict({'model.backbone.depth': 24, 'lr': 0.01})
    assert cfg.model.backbone.depth == 24
    assert cfg.lr == 0.01


def test_dict_action_parses_literals():
    assert DictAction.parse_value('0.5') == 0.5
    assert DictAction.parse_value('true') is True
    assert DictAction.parse_value('(1,2)') == (1, 2)
    assert DictAction.parse_value('abc') == 'abc'


def test_merge_dict_does_not_mutate():
    base = {'a': {'b': 1}}
    out = merge_dict(base, {'a': {'c': 2}})
    assert base == {'a': {'b': 1}}
    assert out == {'a': {'b': 1, 'c': 2}}


def test_reference_shaped_config_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        f = _write(d, 'cfg.py', """
            norm_cfg = dict(type='SyncBN', requires_grad=True)
            model = dict(
                type='EncoderDecoder',
                backbone=dict(type='VisionTransformer', embed_dims=768,
                              num_layers=12, out_indices=(4, 7, 9, 11)),
                decode_head=dict(type='SETRUPHead', num_classes=21,
                                 norm_cfg=norm_cfg))
        """)
        cfg = Config.fromfile(f)
        assert cfg.model.backbone.out_indices == (4, 7, 9, 11)
        text = cfg.pretty_text()
        assert 'SETRUPHead' in text
