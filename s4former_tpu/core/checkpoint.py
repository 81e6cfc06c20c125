"""Checkpointing: orbax for native state, torch .pth ingestion for
OpenMMLab/DeiT weights (checkpoint compatibility is a BASELINE.json north
star).

Reference ingredients being rebuilt:
- OpenMMLab DeiT checkpoint loading with qkv->in_proj remap recipe
  (reference: README.md:42-76) and bicubic pos-embed resize on load
  (mmseg/models/backbones/vit.py:369-414);
- mmcv CheckpointHook periodic save + find_latest_checkpoint auto-resume
  (reference: mmseg/utils/misc.py:7-41, apis/train.py:122-125).

torch (CPU build) is used ONLY host-side to unpickle .pth files and do the
one-time bicubic resize; nothing torch touches the compute path.
"""
from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any


# --------------------------------------------------------------- orbax side
class _AsyncSaver:
    """Background checkpoint writer (round 5, VERDICT r4 next #4).

    orbax's StandardCheckpointer is an AsyncCheckpointer: ``save()``
    copies the state out of device memory synchronously (so the runner's
    donated buffers may be reused immediately) and streams to disk in a
    background thread. The round-4 runs blocked ~4 min per save on
    ``wait_until_finished`` (docs/runs/fixture_r4/leg2.log: it/s craters
    to 0.05-0.19 after every save); deferring the wait to the NEXT save
    (or to shutdown) removes the stall from the step loop.

    Crash safety: the finalize marker ``_CHECKPOINT_METADATA`` is written
    by orbax only at background completion, so a process killed mid-save
    leaves no marker and ``find_all_checkpoints`` (auto-resume) skips the
    incomplete directory — same contract as the blocking path. The side
    effects that must see a COMPLETE checkpoint (meta json, pruning) run
    at finalize time.
    """

    def __init__(self):
        self._ckpt = None
        self._pending = None  # (work_dir, path, meta, keep)

    def save(self, work_dir: str, step: int, state: Pytree, keep: int,
             meta: Optional[Dict], block: bool) -> str:
        import orbax.checkpoint as ocp
        self.finalize()  # at most one save in flight
        if self._ckpt is None:
            self._ckpt = ocp.StandardCheckpointer()
        path = osp.abspath(osp.join(work_dir, f'iter_{step}'))
        self._ckpt.save(path, state, force=True)
        self._pending = (work_dir, path, meta, keep)
        if block:
            self.finalize()
        return path

    def finalize(self) -> Optional[str]:
        """Wait for the in-flight save (if any), then write its meta and
        prune old checkpoints. Returns the finalized path or None."""
        if self._pending is None:
            return None
        self._ckpt.wait_until_finished()
        work_dir, path, meta, keep = self._pending
        self._pending = None
        if meta:
            import json
            with open(osp.join(path, 's4former_meta.json'), 'w') as f:
                json.dump(meta, f)
        _prune_old_checkpoints(work_dir, keep)
        return path


_SAVER = _AsyncSaver()


def save_checkpoint(work_dir: str, step: int, state: Pytree,
                    keep: int = 3, meta: Optional[Dict] = None,
                    block: bool = True) -> str:
    """Save a TrainState under work_dir/iter_{step} (orbax).

    ``block=False`` returns as soon as the state is copied off-device;
    the disk write finishes in the background (finalized on the next
    save, or explicitly via ``finalize_pending_saves()``)."""
    return _SAVER.save(work_dir, step, state, keep, meta, block)


def finalize_pending_saves() -> Optional[str]:
    """Barrier for any in-flight async checkpoint save (call before
    process exit or before reading back the checkpoint just written)."""
    return _SAVER.finalize()


def _prune_old_checkpoints(work_dir: str, keep: int):
    ckpts = find_all_checkpoints(work_dir)
    for path, _ in ckpts[:-keep] if keep > 0 else []:
        import shutil
        shutil.rmtree(path, ignore_errors=True)


def find_all_checkpoints(work_dir: str):
    """COMPLETE checkpoints under work_dir, sorted by step.

    Skips in-flight/aborted saves: ``iter_N.orbax-checkpoint-tmp`` names
    (excluded by the fullmatch) AND plain ``iter_N`` dirs missing orbax's
    finalize marker ``_CHECKPOINT_METADATA`` (a save killed mid-write must
    not be offered to auto-resume — reference utils/misc.py:7-41 contract,
    VERDICT r3 weak #7)."""
    out = []
    if not osp.isdir(work_dir):
        return out
    for name in os.listdir(work_dir):
        m = re.fullmatch(r'iter_(\d+)', name)
        if m and osp.exists(osp.join(work_dir, name,
                                     '_CHECKPOINT_METADATA')):
            out.append((osp.join(work_dir, name), int(m.group(1))))
    return sorted(out, key=lambda x: x[1])


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """Auto-resume discovery (reference utils/misc.py:7-41)."""
    ckpts = find_all_checkpoints(work_dir)
    return ckpts[-1][0] if ckpts else None


def load_checkpoint(path: str, target_state: Optional[Pytree] = None
                    ) -> Pytree:
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    if target_state is None:
        # raw restore (dict of arrays) — lets callers load inference
        # variables from a checkpoint whose TrainState layout differs
        # (e.g. with/without EMA trees)
        return ckpt.restore(osp.abspath(path))
    return ckpt.restore(osp.abspath(path), target=target_state)


def load_inference_variables(path: str) -> Dict:
    raw = load_checkpoint(path)
    return {'params': raw['params'],
            'batch_stats': raw.get('batch_stats', {})}


# ------------------------------------------------------------- torch -> jax
def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(obj, dict):
        for key in ('state_dict', 'model'):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: _to_np(v) for k, v in obj.items()
            if hasattr(v, 'detach') or isinstance(v, np.ndarray)}


def _resize_pos_embed_np(pos: np.ndarray, dst_grid: Tuple[int, int],
                         with_cls: bool = True) -> np.ndarray:
    """Bicubic pos-embed grid resize on load (vit.py:381-395)."""
    import torch
    import torch.nn.functional as F
    grid = pos[:, 1:] if with_cls else pos
    src = int(round(grid.shape[1] ** 0.5))
    if (src, src) == tuple(dst_grid):
        return pos
    t = torch.from_numpy(grid.reshape(1, src, src, -1)).permute(0, 3, 1, 2)
    t = F.interpolate(t.float(), size=dst_grid, mode='bicubic',
                      align_corners=False)
    out = t.permute(0, 2, 3, 1).reshape(1, dst_grid[0] * dst_grid[1],
                                        -1).numpy()
    if with_cls:
        out = np.concatenate([pos[:, :1], out], axis=1)
    return out.astype(pos.dtype)


def _normalize_backbone_keys(sd: Dict[str, np.ndarray]
                             ) -> Dict[str, np.ndarray]:
    """Accept raw DeiT (timm: blocks.i.attn.qkv...) and OpenMMLab-converted
    (backbone.layers.i.attn.attn.in_proj_*) layouts; emit the OpenMMLab one
    (the README.md:42-76 recipe, applied here instead of a manual script)."""
    out = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith('module.'):
            nk = nk[len('module.'):]
        # timm -> mmseg renames
        nk = nk.replace('blocks.', 'layers.') if nk.startswith('blocks.') \
            else nk
        m = re.match(r'layers\.(\d+)\.(.*)', nk)
        if m and not nk.startswith('backbone.'):
            i, rest = m.group(1), m.group(2)
            rest = (rest
                    .replace('norm1.', 'ln1.')
                    .replace('norm2.', 'ln2.')
                    .replace('attn.qkv.weight', 'attn.attn.in_proj_weight')
                    .replace('attn.qkv.bias', 'attn.attn.in_proj_bias')
                    .replace('attn.proj.', 'attn.attn.out_proj.')
                    .replace('mlp.fc1.', 'ffn.layers.0.0.')
                    .replace('mlp.fc2.', 'ffn.layers.1.'))
            nk = f'layers.{i}.{rest}'
        if nk == 'patch_embed.proj.weight':
            nk = 'patch_embed.projection.weight'
        if nk == 'patch_embed.proj.bias':
            nk = 'patch_embed.projection.bias'
        if nk == 'norm.weight':
            nk = 'ln1.weight'  # final norm (unused when final_norm=False)
        if nk == 'norm.bias':
            nk = 'ln1.bias'
        out[nk] = v
    return out


def convert_vit_backbone(sd: Dict[str, np.ndarray],
                         num_layers: int,
                         dst_grid: Optional[Tuple[int, int]] = None
                         ) -> Tuple[Dict, Dict]:
    """OpenMMLab-layout ViT state_dict (keys WITHOUT the 'backbone.'
    prefix) -> (flax params subtree, batch_stats subtree) for our
    VisionTransformer."""
    sd = _normalize_backbone_keys(sd)
    p: Dict[str, Any] = {}
    if 'cls_token' in sd:
        p['cls_token'] = sd['cls_token']
    if 'pos_embed' in sd:
        pos = sd['pos_embed']
        if dst_grid is not None:
            pos = _resize_pos_embed_np(pos, dst_grid)
        p['pos_embed'] = pos
    if 'patch_embed.projection.weight' in sd:
        w = sd['patch_embed.projection.weight']  # [C,3,kh,kw]
        p['patch_embed'] = {
            'kernel': np.transpose(w, (2, 3, 1, 0)),
            'bias': sd['patch_embed.projection.bias'],
        }
    # transformer layers -> STACKED scan layout (our ViT runs the stack as
    # one lax.scan; every per-layer weight gets a leading [num_layers] axis
    # under params['layers']['block'])
    def stack(fn):
        return np.stack([fn(f'layers.{i}.') for i in range(num_layers)])

    if 'layers.0.ln1.weight' in sd:
        p['layers'] = {'block': {
            'ln1': {'scale': stack(lambda pre: sd[pre + 'ln1.weight']),
                    'bias': stack(lambda pre: sd[pre + 'ln1.bias'])},
            'ln2': {'scale': stack(lambda pre: sd[pre + 'ln2.weight']),
                    'bias': stack(lambda pre: sd[pre + 'ln2.bias'])},
            'attn': {
                'qkv': {'kernel': stack(
                    lambda pre: sd[pre + 'attn.attn.in_proj_weight'].T),
                        'bias': stack(
                    lambda pre: sd[pre + 'attn.attn.in_proj_bias'])},
                'proj': {'kernel': stack(
                    lambda pre: sd[pre + 'attn.attn.out_proj.weight'].T),
                         'bias': stack(
                    lambda pre: sd[pre + 'attn.attn.out_proj.bias'])},
            },
            'ffn': {
                'fc1': {'kernel': stack(
                    lambda pre: sd[pre + 'ffn.layers.0.0.weight'].T),
                        'bias': stack(
                    lambda pre: sd[pre + 'ffn.layers.0.0.bias'])},
                'fc2': {'kernel': stack(
                    lambda pre: sd[pre + 'ffn.layers.1.weight'].T),
                        'bias': stack(
                    lambda pre: sd[pre + 'ffn.layers.1.bias'])},
            },
        }}
    return p, {}


def convert_mit_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg MixVisionTransformer state_dict (keys WITHOUT 'backbone.')
    -> flax params subtree for our MixVisionTransformer.

    Reference layout (mmseg/models/backbones/mit.py:414-441): per stage s,
    ``layers.{s}`` is [patch_embed, ModuleList(blocks), stage-LN]:
      layers.{s}.0.projection.{weight,bias} + layers.{s}.0.norm.*
      layers.{s}.1.{i}.norm1/norm2.* (pre-LNs)
      layers.{s}.1.{i}.attn.attn.in_proj_* / out_proj.*   (q|k|v stacked)
      layers.{s}.1.{i}.attn.sr.* + attn.norm.*            (sr_ratio > 1)
      layers.{s}.1.{i}.ffn.layers.{0,1,4}.*  (fc1 1x1 conv, dw 3x3, fc2)
      layers.{s}.2.{weight,bias}             (stage-final LN)
    Ours keeps per-stage module names (mit.py is a plain loop, not a scan):
    patch_embed_{s}/, stage_{s}_block_{i}/, norm_{s}/.
    """
    p: Dict[str, Any] = {}

    def leaf(kernel, bias_key):
        # bias keys are optional: qkv_bias=False / bias-free-conv variants
        # save no bias leaf, and merge_pretrained tolerates a missing one
        # (the flax side supports use_bias=False too)
        out = {'kernel': kernel}
        if bias_key in sd:
            out['bias'] = sd[bias_key]
        return out

    s = 0
    while f'layers.{s}.0.projection.weight' in sd:
        w = sd[f'layers.{s}.0.projection.weight']          # [C,3|Cin,k,k]
        p[f'patch_embed_{s}'] = {
            'proj': leaf(np.transpose(w, (2, 3, 1, 0)),
                         f'layers.{s}.0.projection.bias'),
            'norm': {'scale': sd[f'layers.{s}.0.norm.weight'],
                     'bias': sd[f'layers.{s}.0.norm.bias']},
        }
        i = 0
        while f'layers.{s}.1.{i}.norm1.weight' in sd:
            pre = f'layers.{s}.1.{i}.'
            c = sd[pre + 'norm1.weight'].shape[0]
            in_w = sd[pre + 'attn.attn.in_proj_weight']     # [3C, C]
            attn = {
                'q': {'kernel': in_w[:c].T},
                'kv': {'kernel': in_w[c:].T},
                'proj': leaf(sd[pre + 'attn.attn.out_proj.weight'].T,
                             pre + 'attn.attn.out_proj.bias'),
            }
            if pre + 'attn.attn.in_proj_bias' in sd:
                in_b = sd[pre + 'attn.attn.in_proj_bias']
                attn['q']['bias'] = in_b[:c]
                attn['kv']['bias'] = in_b[c:]
            if pre + 'attn.sr.weight' in sd:
                attn['sr'] = leaf(
                    np.transpose(sd[pre + 'attn.sr.weight'], (2, 3, 1, 0)),
                    pre + 'attn.sr.bias')
                attn['sr_norm'] = {'scale': sd[pre + 'attn.norm.weight'],
                                   'bias': sd[pre + 'attn.norm.bias']}
            fc1 = sd[pre + 'ffn.layers.0.weight']           # [H, C, 1, 1]
            dw = sd[pre + 'ffn.layers.1.weight']            # [H, 1, 3, 3]
            fc2 = sd[pre + 'ffn.layers.4.weight']           # [C, H, 1, 1]
            p[f'stage_{s}_block_{i}'] = {
                'norm1': {'scale': sd[pre + 'norm1.weight'],
                          'bias': sd[pre + 'norm1.bias']},
                'attn': attn,
                'norm2': {'scale': sd[pre + 'norm2.weight'],
                          'bias': sd[pre + 'norm2.bias']},
                'ffn': {
                    'fc1': leaf(fc1[:, :, 0, 0].T,
                                pre + 'ffn.layers.0.bias'),
                    'dwconv': leaf(np.transpose(dw, (2, 3, 1, 0)),
                                   pre + 'ffn.layers.1.bias'),
                    'fc2': leaf(fc2[:, :, 0, 0].T,
                                pre + 'ffn.layers.4.bias'),
                },
            }
            i += 1
        p[f'norm_{s}'] = {'scale': sd[f'layers.{s}.2.weight'],
                          'bias': sd[f'layers.{s}.2.bias']}
        s += 1
    return p, {}


def convert_swin_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg SwinTransformer state_dict (keys WITHOUT 'backbone.') ->
    flax params subtree for our SwinTransformer.

    Reference layout (mmseg/models/backbones/swin.py:575-638 + mmcv FFN):
      patch_embed.projection.{weight,bias} + patch_embed.norm.*
      stages.{s}.blocks.{i}.norm1/norm2.*
      stages.{s}.blocks.{i}.attn.w_msa.{qkv,proj}.* +
        relative_position_bias_table ([(2w-1)^2, nH]; the
        relative_position_index buffer is recomputed, not loaded)
      stages.{s}.blocks.{i}.ffn.layers.0.0.* (fc1) / ffn.layers.1.* (fc2)
      stages.{s}.downsample.{norm,reduction}.*   (PatchMerging)
      norm{s}.{weight,bias}                      (out-indices norms)

    Channel-order note: the reference PatchMerging merges 2x2 patches with
    ``nn.Unfold`` (mmseg/models/utils/embed.py:207-303), whose 4C axis is
    C-major (index = c*4 + ky*2 + kx); our merge reshape is position-major
    (index = (ky*2 + kx)*C + c). The downsample norm + reduction weights
    are permuted accordingly.
    """
    p: Dict[str, Any] = {}
    if 'patch_embed.projection.weight' in sd:
        w = sd['patch_embed.projection.weight']          # [C,3,k,k]
        p['patch_embed'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                            'bias': sd['patch_embed.projection.bias']}
    if 'patch_embed.norm.weight' in sd:
        p['patch_norm'] = {'scale': sd['patch_embed.norm.weight'],
                           'bias': sd['patch_embed.norm.bias']}
    if 'absolute_pos_embed' in sd:
        p['absolute_pos_embed'] = sd['absolute_pos_embed']

    def ln(k):
        return {'scale': sd[k + '.weight'], 'bias': sd[k + '.bias']}

    s = 0
    while f'stages.{s}.blocks.0.norm1.weight' in sd:
        i = 0
        while f'stages.{s}.blocks.{i}.norm1.weight' in sd:
            pre = f'stages.{s}.blocks.{i}.'
            msa = pre + 'attn.w_msa.'
            attn = {
                'qkv': {'kernel': sd[msa + 'qkv.weight'].T},
                'proj': {'kernel': sd[msa + 'proj.weight'].T,
                         'bias': sd[msa + 'proj.bias']},
                'relative_position_bias_table':
                    sd[msa + 'relative_position_bias_table'],
            }
            if msa + 'qkv.bias' in sd:
                attn['qkv']['bias'] = sd[msa + 'qkv.bias']
            p[f'stage_{s}_block_{i}'] = {
                'norm1': ln(pre + 'norm1'),
                'attn': attn,
                'norm2': ln(pre + 'norm2'),
                'fc1': {'kernel': sd[pre + 'ffn.layers.0.0.weight'].T,
                        'bias': sd[pre + 'ffn.layers.0.0.bias']},
                'fc2': {'kernel': sd[pre + 'ffn.layers.1.weight'].T,
                        'bias': sd[pre + 'ffn.layers.1.bias']},
            }
            i += 1
        if f'stages.{s}.downsample.reduction.weight' in sd:
            red = sd[f'stages.{s}.downsample.reduction.weight']  # [2C, 4C]
            c = red.shape[1] // 4
            # ref index c*4+pos  ->  our index pos*C+c
            perm = np.asarray([(j % c) * 4 + j // c for j in range(4 * c)])
            nw = sd[f'stages.{s}.downsample.norm.weight']
            nb = sd[f'stages.{s}.downsample.norm.bias']
            p[f'merge_norm_{s}'] = {'scale': nw[perm], 'bias': nb[perm]}
            p[f'merge_{s}'] = {'kernel': red[:, perm].T}
        if f'norm{s}.weight' in sd:
            p[f'out_norm_{s}'] = ln(f'norm{s}')
        s += 1
    return p, {}


def convert_beit_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg BEiT/MAE state_dict (keys WITHOUT 'backbone.') -> flax params
    subtree for our BEiT/MAE.

    Reference layout (mmseg/models/backbones/beit.py:155-231, mae.py):
      patch_embed.projection.{weight,bias}, cls_token
      layers.{i}.ln1/ln2.*                      (pre-LNs)
      layers.{i}.attn.qkv.weight                (+ .bias for MAE bias=True,
        or attn.q_bias/attn.v_bias for BEiT's 'qv_bias' mode; the
        relative_position_index buffer is recomputed, not loaded)
      layers.{i}.attn.relative_position_bias_table  [(2h-1)(2w-1)+3, nH]
      layers.{i}.attn.proj.*, layers.{i}.gamma_1/gamma_2
      layers.{i}.ffn.layers.0.0.* (fc1) / ffn.layers.1.* (fc2)
      pos_embed (MAE), ln1.{weight,bias}        (MAE final norm)

    MAE's full qkv bias splits into q/k/v thirds; the k third is DROPPED —
    exactly, not approximately: score_ij = q_i.(k_j + b) adds the j-
    independent term q_i.b, which softmax removes. Our module keeps only
    q_bias/v_bias (beit.py BEiTBlock)."""
    p: Dict[str, Any] = {}
    if 'patch_embed.projection.weight' in sd:
        w = sd['patch_embed.projection.weight']          # [C,3,p,p]
        p['patch_embed'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                            'bias': sd['patch_embed.projection.bias']}
    if 'cls_token' in sd:
        p['cls_token'] = sd['cls_token']
    if 'pos_embed' in sd:
        p['pos_embed'] = sd['pos_embed']
    if 'ln1.weight' in sd:                               # MAE final_norm
        p['ln_final'] = {'scale': sd['ln1.weight'], 'bias': sd['ln1.bias']}

    def ln(k):
        return {'scale': sd[k + '.weight'], 'bias': sd[k + '.bias']}

    i = 0
    while f'layers.{i}.ln1.weight' in sd:
        pre = f'layers.{i}.'
        c = sd[pre + 'ln1.weight'].shape[0]
        blk: Dict[str, Any] = {
            'norm1': ln(pre + 'ln1'),
            'norm2': ln(pre + 'ln2'),
            'qkv': {'kernel': sd[pre + 'attn.qkv.weight'].T},
            'proj': {'kernel': sd[pre + 'attn.proj.weight'].T,
                     'bias': sd[pre + 'attn.proj.bias']},
            'relative_position_bias_table':
                sd[pre + 'attn.relative_position_bias_table'],
            'gamma_1': sd[pre + 'gamma_1'],
            'gamma_2': sd[pre + 'gamma_2'],
            'fc1': {'kernel': sd[pre + 'ffn.layers.0.0.weight'].T,
                    'bias': sd[pre + 'ffn.layers.0.0.bias']},
            'fc2': {'kernel': sd[pre + 'ffn.layers.1.weight'].T,
                    'bias': sd[pre + 'ffn.layers.1.bias']},
        }
        if pre + 'attn.q_bias' in sd:                    # BEiT qv_bias
            blk['q_bias'] = sd[pre + 'attn.q_bias']
            blk['v_bias'] = sd[pre + 'attn.v_bias']
        elif pre + 'attn.qkv.bias' in sd:                # MAE bias=True
            qkv_b = sd[pre + 'attn.qkv.bias']
            blk['q_bias'] = qkv_b[:c]
            blk['v_bias'] = qkv_b[2 * c:]                # k third dropped
        p[f'layers_{i}'] = blk
        i += 1
    return p, {}


def convert_resnet_backbone(sd: Dict[str, np.ndarray]
                            ) -> Tuple[Dict, Dict]:
    """mmseg/torchvision ResNet(V1c) state_dict -> (params, batch_stats)
    subtrees for our ResNet.

    Reference layout (mmseg/models/backbones/resnet.py:316-442):
      classic stem: conv1.weight + bn1.*; deep stem (V1c):
      stem.{0,3,6}.weight convs + stem.{1,4,7}.* BNs
      layer{s}.{j}.conv{1..3}.weight + bn{1..3}.* (+ downsample.0/1.*)
    BN running stats land in batch_stats (mean/var)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def convbn(conv_key, bn_key):
        w = sd[conv_key]                                 # [O,I,kh,kw]
        pp = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
              'bn': {'scale': sd[bn_key + '.weight'],
                     'bias': sd[bn_key + '.bias']}}
        bb = {'bn': {'mean': sd[bn_key + '.running_mean'],
                     'var': sd[bn_key + '.running_var']}}
        return pp, bb

    if 'stem.0.weight' in sd:                            # V1c deep stem
        for n, (ck, bk) in enumerate(
                [('stem.0', 'stem.1'), ('stem.3', 'stem.4'),
                 ('stem.6', 'stem.7')], start=1):
            p[f'stem{n}'], bs[f'stem{n}'] = convbn(ck + '.weight', bk)
    elif 'conv1.weight' in sd:
        p['stem'], bs['stem'] = convbn('conv1.weight', 'bn1')

    s = 1
    while f'layer{s}.0.conv1.weight' in sd:
        j = 0
        while f'layer{s}.{j}.conv1.weight' in sd:
            pre = f'layer{s}.{j}.'
            blk_p: Dict[str, Any] = {}
            blk_b: Dict[str, Any] = {}
            for c in (1, 2, 3):
                if pre + f'conv{c}.weight' not in sd:
                    break
                blk_p[f'conv{c}'], blk_b[f'conv{c}'] = convbn(
                    pre + f'conv{c}.weight', pre + f'bn{c}')
            if pre + 'downsample.0.weight' in sd:
                blk_p['downsample'], blk_b['downsample'] = convbn(
                    pre + 'downsample.0.weight', pre + 'downsample.1')
            elif pre + 'downsample.1.weight' in sd:
                # V1d avg_down layout (res_layer.py:49-64): downsample.0
                # is the parameter-free AvgPool, conv/bn shift to .1/.2
                blk_p['downsample'], blk_b['downsample'] = convbn(
                    pre + 'downsample.1.weight', pre + 'downsample.2')
            p[f'layer{s}_{j}'] = blk_p
            bs[f'layer{s}_{j}'] = blk_b
            j += 1
        s += 1
    return p, bs


def convert_resnest_backbone(sd: Dict[str, np.ndarray]
                             ) -> Tuple[Dict, Dict]:
    """mmseg ResNeSt (V1d) state_dict -> our cnn_zoo.ResNeSt layout.

    Reference layout (resnest.py:148-268): deep stem like V1c
    (stem.{0,3,6} convs + stem.{1,4,7} BNs); per block
    ``conv2`` is a SplitAttentionConv2d module (conv2.conv + conv2.bn0 +
    conv2.fc{1,2} biased 1x1s + conv2.bn1); there is NO bn2 and the
    avg_down downsample conv sits at ``downsample.1`` with its BN at
    ``downsample.2`` (index 0 is the param-free AvgPool)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def convbn(conv_key, bn_key):
        w = sd[conv_key]
        pp = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
              'bn': {'scale': sd[bn_key + '.weight'],
                     'bias': sd[bn_key + '.bias']}}
        bb = {'bn': {'mean': sd[bn_key + '.running_mean'],
                     'var': sd[bn_key + '.running_var']}}
        return pp, bb

    def bn(bn_key):
        return ({'scale': sd[bn_key + '.weight'],
                 'bias': sd[bn_key + '.bias']},
                {'mean': sd[bn_key + '.running_mean'],
                 'var': sd[bn_key + '.running_var']})

    for n, (ck, bk) in enumerate(
            [('stem.0', 'stem.1'), ('stem.3', 'stem.4'),
             ('stem.6', 'stem.7')], start=1):
        p[f'stem{n}'], bs[f'stem{n}'] = convbn(ck + '.weight', bk)

    s = 1
    while f'layer{s}.0.conv1.weight' in sd:
        j = 0
        while f'layer{s}.{j}.conv1.weight' in sd:
            pre = f'layer{s}.{j}.'
            blk_p: Dict[str, Any] = {}
            blk_b: Dict[str, Any] = {}
            blk_p['conv1'], blk_b['conv1'] = convbn(pre + 'conv1.weight',
                                                    pre + 'bn1')
            blk_p['conv2'] = {'kernel': np.transpose(
                sd[pre + 'conv2.conv.weight'], (2, 3, 1, 0))}
            blk_p['bn0'], blk_b['bn0'] = bn(pre + 'conv2.bn0')
            blk_p['bn1'], blk_b['bn1'] = bn(pre + 'conv2.bn1')
            for fc in ('fc1', 'fc2'):
                w = sd[pre + f'conv2.{fc}.weight']
                blk_p[fc] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                             'bias': sd[pre + f'conv2.{fc}.bias']}
            blk_p['conv3'], blk_b['conv3'] = convbn(pre + 'conv3.weight',
                                                    pre + 'bn3')
            if pre + 'downsample.1.weight' in sd:
                blk_p['downsample'], blk_b['downsample'] = convbn(
                    pre + 'downsample.1.weight', pre + 'downsample.2')
            p[f'layer{s}_{j}'] = blk_p
            bs[f'layer{s}_{j}'] = blk_b
            j += 1
        s += 1
    return p, bs


def convert_unet_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg UNet state_dict -> our flax params/batch_stats.

    Reference layout (mmseg/models/backbones/unet.py:362-403):
      encoder.{i}.{k}.convs.{c}.{conv,bn}.* — k is 1 when the stage's
      Sequential starts with a (param-less, index-consuming) MaxPool2d;
      decoder.{j}.upsample.interp_upsample.1.{conv,bn}.* (InterpConv,
      conv after the upsample) or decoder.{j}.upsample.{conv,bn}.* (the
      no-upsample 1x1 ConvModule); decoder.{j}.conv_block.convs.{c}.*.
    Ours: enc_{i}.conv{c}, dec_{i}_up, dec_{i}_conv.conv{c} with
    decoder j == stage i-1 (models/backbones/unet.py round-4 rebuild)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def convbn(prefix):
        w = sd[prefix + '.conv.weight']
        pp = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
              'bn': {'scale': sd[prefix + '.bn.weight'],
                     'bias': sd[prefix + '.bn.bias']}}
        bb = {'bn': {'mean': sd[prefix + '.bn.running_mean'],
                     'var': sd[prefix + '.bn.running_var']}}
        return pp, bb

    def convblock(prefix):
        blk_p: Dict[str, Any] = {}
        blk_b: Dict[str, Any] = {}
        c = 0
        while f'{prefix}.convs.{c}.conv.weight' in sd:
            blk_p[f'conv{c}'], blk_b[f'conv{c}'] = convbn(
                f'{prefix}.convs.{c}')
            c += 1
        return blk_p, blk_b

    i = 0
    while True:
        k = 0 if f'encoder.{i}.0.convs.0.conv.weight' in sd else \
            (1 if f'encoder.{i}.1.convs.0.conv.weight' in sd else None)
        if k is None:
            break
        p[f'enc_{i}'], bs[f'enc_{i}'] = convblock(f'encoder.{i}.{k}')
        i += 1
    j = 0
    while f'decoder.{j}.conv_block.convs.0.conv.weight' in sd:
        si = j + 1   # decoder[j] upsamples INTO encoder stage j (= i-1)
        dk = f'decoder.{j}.upsample.deconv_upsamping.0.weight'
        if dk in sd:
            # DeconvModule (ref unet.py:129-138): ConvTranspose + BN +
            # ReLU; torch deconv kernel [I, O, kh, kw] -> flax
            # transpose(2,3,0,1) + flip both spatial axes
            w = sd[dk]
            bnk = f'decoder.{j}.upsample.deconv_upsamping.1'
            p[f'dec_{si}_up'] = {
                'deconv': {
                    'kernel': np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
                    .copy(),
                    'bias': sd[dk.replace('.weight', '.bias')]},
                'bn': {'scale': sd[bnk + '.weight'],
                       'bias': sd[bnk + '.bias']}}
            bs[f'dec_{si}_up'] = {
                'bn': {'mean': sd[bnk + '.running_mean'],
                       'var': sd[bnk + '.running_var']}}
        else:
            ik = f'decoder.{j}.upsample.interp_upsample.1'
            up = ik if ik + '.conv.weight' in sd \
                else f'decoder.{j}.upsample'
            p[f'dec_{si}_up'], bs[f'dec_{si}_up'] = convbn(up)
        p[f'dec_{si}_conv'], bs[f'dec_{si}_conv'] = convblock(
            f'decoder.{j}.conv_block')
        j += 1
    return p, bs


def convert_hrnet_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg HRNet state_dict -> our flax params/batch_stats.

    Reference layout (mmseg/models/backbones/hrnet.py:376-568):
      conv1/bn1 + conv2/bn2 stem;
      layer1.{k}.conv{1..3}/bn{1..3}(+downsample.0/1) ResNet blocks;
      transition{t}.{i}.0/.1 (channel-fix) or .{i}.{j}.0/.1 (new-branch
      stride-2 chain, each element a Sequential(conv, bn[, relu]));
      stage{s}.{m}.branches.{b}.{k}.conv{1,2}/bn{1,2}(+downsample.0/1);
      stage{s}.{m}.fuse_layers.{i}.{j}.0/.1 (1x1+BN, j>i) or
      .{i}.{j}.{k}.0/.1 (downsample chain, j<i).
    Ours: conv1/conv2, layer1_{k}, transition{t}_{i}[_{j}],
    stage{s}_m{m}_br{b}_b{k}, stage{s}_m{m}_fuse_{i}_{j}[_{k}] — each a
    ConvBN {conv,bn} (models/backbones/hrnet.py round-4 exact rebuild).
    """
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def convbn(conv_key, bn_key):
        w = sd[conv_key]
        pp = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
              'bn': {'scale': sd[bn_key + '.weight'],
                     'bias': sd[bn_key + '.bias']}}
        bb = {'bn': {'mean': sd[bn_key + '.running_mean'],
                     'var': sd[bn_key + '.running_var']}}
        return pp, bb

    def resblock(pre):
        blk_p: Dict[str, Any] = {}
        blk_b: Dict[str, Any] = {}
        for c in (1, 2, 3):
            if pre + f'conv{c}.weight' not in sd:
                break
            blk_p[f'conv{c}'], blk_b[f'conv{c}'] = convbn(
                pre + f'conv{c}.weight', pre + f'bn{c}')
        if pre + 'downsample.0.weight' in sd:
            blk_p['downsample'], blk_b['downsample'] = convbn(
                pre + 'downsample.0.weight', pre + 'downsample.1')
        return blk_p, blk_b

    p['conv1'], bs['conv1'] = convbn('conv1.weight', 'bn1')
    p['conv2'], bs['conv2'] = convbn('conv2.weight', 'bn2')
    k = 0
    while f'layer1.{k}.conv1.weight' in sd:
        p[f'layer1_{k}'], bs[f'layer1_{k}'] = resblock(f'layer1.{k}.')
        k += 1
    for t in (1, 2, 3):
        i = 0
        while True:
            if f'transition{t}.{i}.0.weight' in sd:      # channel fix
                p[f'transition{t}_{i}'], bs[f'transition{t}_{i}'] = \
                    convbn(f'transition{t}.{i}.0.weight',
                           f'transition{t}.{i}.1')
            elif f'transition{t}.{i}.0.0.weight' in sd:  # new-branch chain
                j = 0
                while f'transition{t}.{i}.{j}.0.weight' in sd:
                    key = f'transition{t}_{i}_{j}'
                    p[key], bs[key] = convbn(
                        f'transition{t}.{i}.{j}.0.weight',
                        f'transition{t}.{i}.{j}.1')
                    j += 1
            elif i >= 8:   # identity transitions leave index gaps
                break
            i += 1
    for s in (2, 3, 4):
        m = 0
        while f'stage{s}.{m}.branches.0.0.conv1.weight' in sd:
            b = 0
            while f'stage{s}.{m}.branches.{b}.0.conv1.weight' in sd:
                k = 0
                while f'stage{s}.{m}.branches.{b}.{k}.conv1.weight' in sd:
                    key = f'stage{s}_m{m}_br{b}_b{k}'
                    p[key], bs[key] = resblock(
                        f'stage{s}.{m}.branches.{b}.{k}.')
                    k += 1
                b += 1
            for i in range(b):
                for j in range(b):
                    if f'stage{s}.{m}.fuse_layers.{i}.{j}.0.weight' in sd:
                        key = f'stage{s}_m{m}_fuse_{i}_{j}'
                        p[key], bs[key] = convbn(
                            f'stage{s}.{m}.fuse_layers.{i}.{j}.0.weight',
                            f'stage{s}.{m}.fuse_layers.{i}.{j}.1')
                    kk = 0
                    while (f'stage{s}.{m}.fuse_layers.{i}.{j}.{kk}.0.weight'
                           in sd):
                        key = f'stage{s}_m{m}_fuse_{i}_{j}_{kk}'
                        p[key], bs[key] = convbn(
                            f'stage{s}.{m}.fuse_layers.{i}.{j}.{kk}.0'
                            '.weight',
                            f'stage{s}.{m}.fuse_layers.{i}.{j}.{kk}.1')
                        kk += 1
            m += 1
    return p, bs


def convert_mobilenet_v2_backbone(
        sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg MobileNetV2 state_dict -> our flax params/batch_stats.

    Reference layout (mmseg/models/backbones/mobilenet_v2.py:108-180 via
    mmcv InvertedResidual): ``conv1.{conv,bn}.*`` stem, then
    ``layer{s}.{j}.conv.{k}.{conv,bn}.*`` where the inner Sequential is
    [expand 1x1, dw 3x3, project 1x1] for expand_ratio != 1 (layers 2-7)
    and [dw, project] for layer1's expand_ratio 1. Ours names the same
    three ConvBNActs expand/dw/project under ``layer{s-1}_{j}``.
    Depthwise torch weights [C,1,k,k] transpose to flax grouped-conv
    [k,k,1,C] like any OIHW->HWIO."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def convbn(prefix):
        w = sd[prefix + '.conv.weight']
        pp = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
              'bn': {'scale': sd[prefix + '.bn.weight'],
                     'bias': sd[prefix + '.bn.bias']}}
        bb = {'bn': {'mean': sd[prefix + '.bn.running_mean'],
                     'var': sd[prefix + '.bn.running_var']}}
        return pp, bb

    p['stem'], bs['stem'] = convbn('conv1')
    s = 1
    while f'layer{s}.0.conv.0.conv.weight' in sd:
        j = 0
        while f'layer{s}.{j}.conv.0.conv.weight' in sd:
            pre = f'layer{s}.{j}.conv'
            has_expand = f'{pre}.2.conv.weight' in sd
            names = ('expand', 'dw', 'project') if has_expand \
                else ('dw', 'project')
            blk_p: Dict[str, Any] = {}
            blk_b: Dict[str, Any] = {}
            for k, name in enumerate(names):
                blk_p[name], blk_b[name] = convbn(f'{pre}.{k}')
            p[f'layer{s - 1}_{j}'] = blk_p
            bs[f'layer{s - 1}_{j}'] = blk_b
            j += 1
        s += 1
    return p, bs


def convert_twins_backbone(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """mmseg Twins (PCPVT/SVT) state_dict -> flax params subtree.

    Reference layout (mmseg/models/backbones/twins.py:78-510):
      patch_embeds.{s}.projection.* + patch_embeds.{s}.norm.*
      position_encodings.{s}.proj.*      (CPE depthwise 3x3, groups=C)
      layers.{s}.{j}.norm1/norm2.*
      GSA blocks: layers.{s}.{j}.attn.attn.in_proj_* / out_proj.* +
        attn.sr.* + attn.norm.*          (EfficientMultiheadAttention)
      LSA blocks: layers.{s}.{j}.attn.qkv.* / attn.proj.*   (SVT even j)
      layers.{s}.{j}.ffn.layers.0.0.* / ffn.layers.1.*
      norm_list.{s}.*                    (norm_after_stage)
    """
    p: Dict[str, Any] = {}

    def ln(k):
        return {'scale': sd[k + '.weight'], 'bias': sd[k + '.bias']}

    s = 0
    while f'patch_embeds.{s}.projection.weight' in sd:
        w = sd[f'patch_embeds.{s}.projection.weight']     # [C,Cin,p,p]
        p[f'patch_embed_{s}'] = {
            'kernel': np.transpose(w, (2, 3, 1, 0)),
            'bias': sd[f'patch_embeds.{s}.projection.bias']}
        p[f'embed_norm_{s}'] = ln(f'patch_embeds.{s}.norm')
        if f'position_encodings.{s}.proj.weight' in sd:
            dw = sd[f'position_encodings.{s}.proj.weight']  # [C,1,3,3]
            p[f'peg_{s}'] = {
                'kernel': np.transpose(dw, (2, 3, 1, 0)),
                'bias': sd[f'position_encodings.{s}.proj.bias']}
        j = 0
        while f'layers.{s}.{j}.norm1.weight' in sd:
            pre = f'layers.{s}.{j}.'
            if pre + 'attn.qkv.weight' in sd:             # LSA
                attn = {'qkv': {'kernel': sd[pre + 'attn.qkv.weight'].T},
                        'proj': {'kernel': sd[pre + 'attn.proj.weight'].T,
                                 'bias': sd[pre + 'attn.proj.bias']}}
                if pre + 'attn.qkv.bias' in sd:
                    attn['qkv']['bias'] = sd[pre + 'attn.qkv.bias']
            else:                                         # GSA
                c = sd[pre + 'norm1.weight'].shape[0]
                in_w = sd[pre + 'attn.attn.in_proj_weight']   # [3C, C]
                attn = {
                    'q': {'kernel': in_w[:c].T},
                    'kv': {'kernel': in_w[c:].T},
                    'proj': {
                        'kernel': sd[pre + 'attn.attn.out_proj.weight'].T,
                        'bias': sd[pre + 'attn.attn.out_proj.bias']},
                }
                if pre + 'attn.attn.in_proj_bias' in sd:
                    in_b = sd[pre + 'attn.attn.in_proj_bias']
                    attn['q']['bias'] = in_b[:c]
                    attn['kv']['bias'] = in_b[c:]
                if pre + 'attn.sr.weight' in sd:
                    attn['sr'] = {
                        'kernel': np.transpose(sd[pre + 'attn.sr.weight'],
                                               (2, 3, 1, 0)),
                        'bias': sd[pre + 'attn.sr.bias']}
                    attn['sr_norm'] = ln(pre + 'attn.norm')
            p[f'stage{s}_block{j}'] = {
                'norm1': ln(pre + 'norm1'),
                'attn': attn,
                'norm2': ln(pre + 'norm2'),
                'mlp': {
                    'fc1': {'kernel': sd[pre + 'ffn.layers.0.0.weight'].T,
                            'bias': sd[pre + 'ffn.layers.0.0.bias']},
                    'fc2': {'kernel': sd[pre + 'ffn.layers.1.weight'].T,
                            'bias': sd[pre + 'ffn.layers.1.bias']},
                },
            }
            j += 1
        if f'norm_list.{s}.weight' in sd:
            p[f'out_norm_{s}'] = ln(f'norm_list.{s}')
        s += 1
    return p, {}


def convert_segformer_head(sd: Dict[str, np.ndarray], prefix: str = ''
                           ) -> Tuple[Dict, Dict]:
    """mmseg SegformerHead state_dict -> (params, batch_stats) subtrees.

    Reference (segformer_head.py:120-135): per-level 1x1 ConvModule
    ``convs.{i}`` (conv-no-bias + BN + ReLU), ``fusion_conv`` (1x1 conv +
    BN), ``conv_seg``. Our flax head implements the per-level 1x1 conv as
    a Dense (same math on NHWC) named ``convs_{i}`` + ``convs_{i}_bn``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]  # noqa: E731

    i = 0
    while prefix + f'convs.{i}.conv.weight' in sd:
        w = g(f'convs.{i}.conv.weight')             # [Cout, Cin, 1, 1]
        p[f'convs_{i}'] = {'kernel': w[:, :, 0, 0].T}
        p[f'convs_{i}_bn'] = {'scale': g(f'convs.{i}.bn.weight'),
                              'bias': g(f'convs.{i}.bn.bias')}
        bs[f'convs_{i}_bn'] = {'mean': g(f'convs.{i}.bn.running_mean'),
                               'var': g(f'convs.{i}.bn.running_var')}
        i += 1
    if prefix + 'fusion_conv.conv.weight' in sd:
        w = g('fusion_conv.conv.weight')
        p['fusion_conv'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        p['fusion_bn'] = {'scale': g('fusion_conv.bn.weight'),
                          'bias': g('fusion_conv.bn.bias')}
        bs['fusion_bn'] = {'mean': g('fusion_conv.bn.running_mean'),
                           'var': g('fusion_conv.bn.running_var')}
    if prefix + 'conv_seg.weight' in sd:
        w = g('conv_seg.weight')
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': g('conv_seg.bias')}
    return p, bs


def _convmodule(sd, key):
    """mmseg ConvModule (conv-no-bias + BN) -> ConvBNReLU subtrees."""
    w = sd[key + '.conv.weight']
    p = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
         'bn': {'scale': sd[key + '.bn.weight'],
                'bias': sd[key + '.bn.bias']}}
    if key + '.conv.bias' in sd:
        p['conv']['bias'] = sd[key + '.conv.bias']
    bs = {'bn': {'mean': sd[key + '.bn.running_mean'],
                 'var': sd[key + '.bn.running_var']}}
    return p, bs


def convert_fcn_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg FCNHead (fcn_head.py: convs + optional conv_cat + conv_seg)
    -> our misc_heads.FCNHead layout."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'convs.{i}.conv.weight' in sd:
        p[f'convs_{i}'], bs[f'convs_{i}'] = _convmodule(
            sd, prefix + f'convs.{i}')
        i += 1
    if prefix + 'conv_cat.conv.weight' in sd:
        p['conv_cat'], bs['conv_cat'] = _convmodule(sd, prefix + 'conv_cat')
    if prefix + 'conv_seg.weight' in sd:
        w = sd[prefix + 'conv_seg.weight']
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': sd[prefix + 'conv_seg.bias']}
    return p, bs


def convert_point_head(sd: Dict[str, np.ndarray], prefix: str = ''
                       ) -> Tuple[Dict, Dict]:
    """mmseg PointHead (point_head.py:92-113: ``fcs`` = Conv1d ConvModules
    with norm None, ``fc_seg`` = nn.Conv1d k=1) -> our
    advanced_heads.PointHead Dense layout (fc_{i}/fc_seg). A kernel-1
    Conv1d [out, in, 1] is exactly a Dense with kernel w[:, :, 0].T."""
    p: Dict[str, Any] = {}
    i = 0
    while prefix + f'fcs.{i}.conv.weight' in sd:
        w = sd[prefix + f'fcs.{i}.conv.weight']
        p[f'fc_{i}'] = {'kernel': w[:, :, 0].T,
                        'bias': sd[prefix + f'fcs.{i}.conv.bias']}
        i += 1
    w = sd[prefix + 'fc_seg.weight']
    p['fc_seg'] = {'kernel': w[:, :, 0].T,
                   'bias': sd[prefix + 'fc_seg.bias']}
    return p, {}


def convert_psp_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg PSPHead (psp_head.py PPM: psp_modules.{i}.1 ConvModule after
    the adaptive pool + bottleneck + conv_seg) -> misc_heads.PSPHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'psp_modules.{i}.1.conv.weight' in sd:
        p[f'pool_conv_{i}'], bs[f'pool_conv_{i}'] = _convmodule(
            sd, prefix + f'psp_modules.{i}.1')
        i += 1
    if prefix + 'bottleneck.conv.weight' in sd:
        p['bottleneck'], bs['bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    if prefix + 'conv_seg.weight' in sd:
        w = sd[prefix + 'conv_seg.weight']
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': sd[prefix + 'conv_seg.bias']}
    return p, bs


def convert_uper_head(sd: Dict[str, np.ndarray], prefix: str = ''
                      ) -> Tuple[Dict, Dict]:
    """mmseg UPerHead (uper_head.py: PPM + bottleneck + lateral_convs +
    fpn_convs + fpn_bottleneck + conv_seg) -> misc_heads.UPerHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'psp_modules.{i}.1.conv.weight' in sd:
        p[f'psp_{i}'], bs[f'psp_{i}'] = _convmodule(
            sd, prefix + f'psp_modules.{i}.1')
        i += 1
    if prefix + 'bottleneck.conv.weight' in sd:
        p['psp_bottleneck'], bs['psp_bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    for ref, ours in (('lateral_convs', 'lateral'), ('fpn_convs', 'fpn')):
        i = 0
        while prefix + f'{ref}.{i}.conv.weight' in sd:
            p[f'{ours}_{i}'], bs[f'{ours}_{i}'] = _convmodule(
                sd, prefix + f'{ref}.{i}')
            i += 1
    if prefix + 'fpn_bottleneck.conv.weight' in sd:
        p['fpn_bottleneck'], bs['fpn_bottleneck'] = _convmodule(
            sd, prefix + 'fpn_bottleneck')
    if prefix + 'conv_seg.weight' in sd:
        w = sd[prefix + 'conv_seg.weight']
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': sd[prefix + 'conv_seg.bias']}
    return p, bs


def _sepconvmodule(sd, key):
    """mmcv DepthwiseSeparableConvModule -> zoo_heads.SepConvBNReLU
    subtrees (depthwise/dw_bn + pointwise/pw_bn; both convs bias-free)."""
    dw = sd[key + '.depthwise_conv.conv.weight']   # [C, 1, k, k]
    pw = sd[key + '.pointwise_conv.conv.weight']   # [Cout, C, 1, 1]
    p = {'depthwise': {'kernel': np.transpose(dw, (2, 3, 1, 0))},
         'dw_bn': {'scale': sd[key + '.depthwise_conv.bn.weight'],
                   'bias': sd[key + '.depthwise_conv.bn.bias']},
         'pointwise': {'kernel': np.transpose(pw, (2, 3, 1, 0))},
         'pw_bn': {'scale': sd[key + '.pointwise_conv.bn.weight'],
                   'bias': sd[key + '.pointwise_conv.bn.bias']}}
    bs = {'dw_bn': {'mean': sd[key + '.depthwise_conv.bn.running_mean'],
                    'var': sd[key + '.depthwise_conv.bn.running_var']},
          'pw_bn': {'mean': sd[key + '.pointwise_conv.bn.running_mean'],
                    'var': sd[key + '.pointwise_conv.bn.running_var']}}
    return p, bs


def _conv_seg(sd, prefix, p):
    if prefix + 'conv_seg.weight' in sd:
        w = sd[prefix + 'conv_seg.weight']
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': sd[prefix + 'conv_seg.bias']}


def convert_aspp_head(sd: Dict[str, np.ndarray], prefix: str = ''
                      ) -> Tuple[Dict, Dict]:
    """mmseg ASPPHead / DepthwiseSeparableASPPHead state_dict -> our
    zoo_heads layout.

    Reference (aspp_head.py:54-121, sep_aspp_head.py:30-109): image_pool
    is ``nn.Sequential(AdaptiveAvgPool2d(1), ConvModule)`` so its conv
    lives at ``image_pool.1``; ``aspp_modules.{i}`` is a plain ConvModule
    for dilation==1 and (DS variant) a DepthwiseSeparableConvModule for
    dilation>1; DeepLabV3+ adds ``c1_bottleneck`` and the two-stage
    ``sep_bottleneck.{0,1}``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    if prefix + 'image_pool.1.conv.weight' in sd:
        p['image_pool'], bs['image_pool'] = _convmodule(
            sd, prefix + 'image_pool.1')
    i = 0
    while True:
        key = prefix + f'aspp_modules.{i}'
        if key + '.conv.weight' in sd:
            p[f'aspp_{i}'], bs[f'aspp_{i}'] = _convmodule(sd, key)
        elif key + '.depthwise_conv.conv.weight' in sd:
            p[f'aspp_{i}'], bs[f'aspp_{i}'] = _sepconvmodule(sd, key)
        else:
            break
        i += 1
    if prefix + 'bottleneck.conv.weight' in sd:
        p['bottleneck'], bs['bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    if prefix + 'c1_bottleneck.conv.weight' in sd:
        p['c1_bottleneck'], bs['c1_bottleneck'] = _convmodule(
            sd, prefix + 'c1_bottleneck')
    for j in (0, 1):
        key = prefix + f'sep_bottleneck.{j}'
        if key + '.depthwise_conv.conv.weight' in sd:
            p[f'sep_fuse_{j}'], bs[f'sep_fuse_{j}'] = _sepconvmodule(
                sd, key)
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_bisenetv2_backbone(sd: Dict[str, np.ndarray]
                               ) -> Tuple[Dict, Dict]:
    """mmseg BiSeNetV2 state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.BiSeNetV2 layout.

    Reference layout (bisenetv2.py): ``detail.detail_branch.{i}.{j}``
    ConvModules; ``semantic.stage1`` StemBlock (conv_first/convs.{0,1}/
    fuse_last); ``semantic.stage{s}.{j}`` GELayers (conv1, dwconv.{0,1},
    conv2.0, shortcut.0.{depthwise,pointwise}_conv); ``semantic.
    stage4_CEBlock`` (gap.1 BN, conv_gap, conv_last); ``bga`` (detail_
    dwconv/semantic_dwconv DW-separable with BIASED no-norm pointwise,
    detail_down, semantic_conv, conv)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def cm(ref_key, our_key):
        if ref_key + '.conv.weight' in sd:
            p[our_key], bs[our_key] = _convmodule(sd, ref_key)
            return True
        return False

    i = 0
    while cm(f'detail.detail_branch.{i}.0', f'detail_{i}_0'):
        j = 1
        while cm(f'detail.detail_branch.{i}.{j}', f'detail_{i}_{j}'):
            j += 1
        i += 1
    cm('semantic.stage1.conv_first', 'stem_first')
    cm('semantic.stage1.convs.0', 'stem_convs_0')
    cm('semantic.stage1.convs.1', 'stem_convs_1')
    cm('semantic.stage1.fuse_last', 'stem_fuse')
    s = 2
    while f'semantic.stage{s}.0.conv1.conv.weight' in sd:
        j = 0
        while f'semantic.stage{s}.{j}.conv1.conv.weight' in sd:
            ge: Dict[str, Any] = {}
            gbs: Dict[str, Any] = {}
            pre = f'semantic.stage{s}.{j}.'
            for ref, ours in (('conv1', 'conv1'),
                              ('dwconv.0', 'dwconv_0'),
                              ('dwconv.1', 'dwconv_1'),
                              ('conv2.0', 'conv2'),
                              ('shortcut.0.depthwise_conv', 'short_dw'),
                              ('shortcut.0.pointwise_conv', 'short_pw')):
                if pre + ref + '.conv.weight' in sd:
                    ge[ours], gbs[ours] = _convmodule(sd, pre + ref)
            p[f'stage{s}_{j}'] = ge
            bs[f'stage{s}_{j}'] = gbs
            j += 1
        s += 1
    ce = f'semantic.stage{s - 1}_CEBlock'
    if ce + '.gap.1.weight' in sd:
        p['ce_gap_bn'] = {'scale': sd[ce + '.gap.1.weight'],
                          'bias': sd[ce + '.gap.1.bias']}
        bs['ce_gap_bn'] = {'mean': sd[ce + '.gap.1.running_mean'],
                           'var': sd[ce + '.gap.1.running_var']}
    cm(ce + '.conv_gap', 'ce_conv_gap')
    cm(ce + '.conv_last', 'ce_conv_last')
    cm('bga.detail_dwconv.0.depthwise_conv', 'bga_detail_dw')
    cm('bga.detail_down.0', 'bga_detail_down')
    cm('bga.semantic_conv.0', 'bga_semantic_conv')
    cm('bga.semantic_dwconv.0.depthwise_conv', 'bga_semantic_dw')
    cm('bga.conv', 'bga_conv')
    for ref, ours in (('bga.detail_dwconv.0.pointwise_conv',
                       'bga_detail_pw'),
                      ('bga.semantic_dwconv.0.pointwise_conv',
                       'bga_semantic_pw')):
        if ref + '.conv.weight' in sd:
            w = sd[ref + '.conv.weight']
            p[ours] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                       'bias': sd[ref + '.conv.bias']}
    return p, bs


def _dwsep(sd, key, dw_name, bn_name, pw_name, p, bs):
    """DepthwiseSeparableConvModule -> split flax modules: bare dw conv +
    standalone BN (+ pointwise ConvBN)."""
    dw = sd[key + '.depthwise_conv.conv.weight']
    p[dw_name] = {'kernel': np.transpose(dw, (2, 3, 1, 0))}
    p[bn_name] = {'scale': sd[key + '.depthwise_conv.bn.weight'],
                  'bias': sd[key + '.depthwise_conv.bn.bias']}
    bs[bn_name] = {'mean': sd[key + '.depthwise_conv.bn.running_mean'],
                   'var': sd[key + '.depthwise_conv.bn.running_var']}
    p[pw_name], bs[pw_name] = _convmodule(sd, key + '.pointwise_conv')


def convert_fastscnn_backbone(sd: Dict[str, np.ndarray]
                              ) -> Tuple[Dict, Dict]:
    """mmseg FastSCNN state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.FastSCNN layout.

    Reference layout (fast_scnn.py:13-270):
    ``learning_to_downsample.{conv,dsconv1,dsconv2}``;
    ``global_feature_extractor.bottleneck{1..3}.{j}.conv.{0,1,2}``
    (InvertedResidual expand/dw/linear ConvModules),
    ``...ppm.{i}.1``, ``...out``; ``feature_fusion.{dwconv,
    conv_lower_res,conv_higher_res}``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p['lds0'], bs['lds0'] = _convmodule(sd, 'learning_to_downsample.conv')
    _dwsep(sd, 'learning_to_downsample.dsconv1', 'lds1_dw', 'lds1_bn',
           'lds1_pw', p, bs)
    _dwsep(sd, 'learning_to_downsample.dsconv2', 'lds2_dw', 'lds2_bn',
           'lds2_pw', p, bs)
    g = 'global_feature_extractor.'
    for i in range(3):
        j = 0
        while f'{g}bottleneck{i + 1}.{j}.conv.0.conv.weight' in sd:
            pre = f'{g}bottleneck{i + 1}.{j}.conv.'
            mp: Dict[str, Any] = {}
            mb: Dict[str, Any] = {}
            mp['expand'], mb['expand'] = _convmodule(sd, pre + '0')
            dw = sd[pre + '1.conv.weight']
            mp['dw'] = {'kernel': np.transpose(dw, (2, 3, 1, 0))}
            mp['dw_bn'] = {'scale': sd[pre + '1.bn.weight'],
                           'bias': sd[pre + '1.bn.bias']}
            mb['dw_bn'] = {'mean': sd[pre + '1.bn.running_mean'],
                           'var': sd[pre + '1.bn.running_var']}
            mp['proj'], mb['proj'] = _convmodule(sd, pre + '2')
            p[f'gfe_{i}_{j}'] = mp
            bs[f'gfe_{i}_{j}'] = mb
            j += 1
    i = 0
    while f'{g}ppm.{i}.1.conv.weight' in sd:
        p[f'ppm_{i}'], bs[f'ppm_{i}'] = _convmodule(sd, f'{g}ppm.{i}.1')
        i += 1
    p['ppm_out'], bs['ppm_out'] = _convmodule(sd, g + 'out')
    f = 'feature_fusion.'
    dw = sd[f + 'dwconv.conv.weight']
    p['ffm_dw'] = {'kernel': np.transpose(dw, (2, 3, 1, 0))}
    p['ffm_dw_bn'] = {'scale': sd[f + 'dwconv.bn.weight'],
                      'bias': sd[f + 'dwconv.bn.bias']}
    bs['ffm_dw_bn'] = {'mean': sd[f + 'dwconv.bn.running_mean'],
                       'var': sd[f + 'dwconv.bn.running_var']}
    p['ffm_low'], bs['ffm_low'] = _convmodule(sd, f + 'conv_lower_res')
    p['ffm_high'], bs['ffm_high'] = _convmodule(sd, f + 'conv_higher_res')
    return p, bs


def convert_mobilenet_v3_backbone(sd: Dict[str, np.ndarray]
                                  ) -> Tuple[Dict, Dict]:
    """mmseg MobileNetV3 state_dict (keys WITHOUT 'backbone.') -> our
    mobilenet.MobileNetV3 layout.

    Reference layout (mobilenet_v3.py:130-207): ``layer0``/``layer{N+1}``
    plain ConvModules; ``layer{i}`` InvertedResidualV3 with
    ``expand_conv``/``depthwise_conv``/``linear_conv`` ConvModules and
    biased SE convs at ``se.conv{1,2}.conv``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while True:
        li = f'layer{i}'
        if li + '.conv.weight' in sd:            # stem / final ConvModule
            p[li], bs[li] = _convmodule(sd, li)
        elif li + '.depthwise_conv.conv.weight' in sd:
            for ref, ours in (('expand_conv', f'{li}_expand'),
                              ('depthwise_conv', f'{li}_dw'),
                              ('linear_conv', f'{li}_linear')):
                if f'{li}.{ref}.conv.weight' in sd:
                    p[ours], bs[ours] = _convmodule(sd, f'{li}.{ref}')
            for n in (1, 2):
                key = f'{li}.se.conv{n}.conv'
                if key + '.weight' in sd:
                    w = sd[key + '.weight']
                    p[f'{li}_se{n}'] = {
                        'kernel': np.transpose(w, (2, 3, 1, 0)),
                        'bias': sd[key + '.bias']}
        else:
            break
        i += 1
    return p, bs


def convert_erfnet_backbone(sd: Dict[str, np.ndarray]
                            ) -> Tuple[Dict, Dict]:
    """mmseg ERFNet state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.ERFNet layout.

    Reference layout (erfnet.py:11-331): flat ``encoder.{i}`` /
    ``decoder.{i}`` ModuleLists. DownsamplerBlock: biased ``conv`` +
    ``bn``. NonBottleneck1d: ``convs_layers.{0,2,5,7}`` biased convs +
    ``convs_layers.{3,8}`` BNs. UpsamplerBlock: ConvTranspose2d
    ``conv`` — kernel maps to flax as transpose(2,3,0,1) with BOTH
    spatial axes flipped (torch deconv == flax ConvTranspose with
    padding ((1,2),(1,2)); pinned in tests/test_core/
    test_erfnet_parity.py) + ``bn``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def bn(key):
        return ({'scale': sd[key + '.weight'], 'bias': sd[key + '.bias']},
                {'mean': sd[key + '.running_mean'],
                 'var': sd[key + '.running_var']})

    def conv(key):
        w = sd[key + '.weight']
        out = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        if key + '.bias' in sd:
            out['bias'] = sd[key + '.bias']
        return out

    def nonbottleneck(pre):
        mp: Dict[str, Any] = {}
        mb: Dict[str, Any] = {}
        mp['c31a'] = conv(pre + 'convs_layers.0')
        mp['c13a'] = conv(pre + 'convs_layers.2')
        mp['bn1'], mb['bn1'] = bn(pre + 'convs_layers.3')
        mp['c31b'] = conv(pre + 'convs_layers.5')
        mp['c13b'] = conv(pre + 'convs_layers.7')
        mp['bn2'], mb['bn2'] = bn(pre + 'convs_layers.8')
        return mp, mb

    i = 0
    while f'encoder.{i}.conv.weight' in sd or \
            f'encoder.{i}.convs_layers.0.weight' in sd:
        pre = f'encoder.{i}.'
        if pre + 'conv.weight' in sd:            # DownsamplerBlock
            mp = {'conv': conv(pre + 'conv')}
            mp['bn'], mbn = bn(pre + 'bn')
            p[f'encoder_{i}'] = mp
            bs[f'encoder_{i}'] = {'bn': mbn}
        else:
            p[f'encoder_{i}'], bs[f'encoder_{i}'] = nonbottleneck(pre)
        i += 1
    i = 0
    while f'decoder.{i}.conv.weight' in sd or \
            f'decoder.{i}.convs_layers.0.weight' in sd:
        pre = f'decoder.{i}.'
        if pre + 'conv.weight' in sd:            # UpsamplerBlock
            w = sd[pre + 'conv.weight']          # [Cin, Cout, 3, 3]
            p[f'decoder_{i}_conv'] = {
                'kernel': np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy(),
                'bias': sd[pre + 'conv.bias']}
            pb, sb = bn(pre + 'bn')
            p[f'decoder_{i}_bn'] = pb
            bs[f'decoder_{i}_bn'] = sb
        else:
            p[f'decoder_{i}'], bs[f'decoder_{i}'] = nonbottleneck(pre)
        i += 1
    return p, bs


def convert_cgnet_backbone(sd: Dict[str, np.ndarray]
                           ) -> Tuple[Dict, Dict]:
    """mmseg CGNet state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.CGNet layout.

    Reference layout (cgnet.py:54-363): ``stem.{i}`` ConvModules with a
    parametric PReLU at ``.activate``; ``norm_prelu_{k}.{0,1}`` BN +
    PReLU after each stage concat; ``level{1,2}.{j}`` CG blocks
    (conv1x1 ConvModule+PReLU, bias-free depthwise f_loc/f_sur, joint
    bn + activate PReLU, downsample-only ``bottleneck``, f_glo.fc
    Linear SE)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def prelu(key):
        return {'alpha': sd[key + '.weight']}

    def bnorm(key):
        return ({'scale': sd[key + '.weight'], 'bias': sd[key + '.bias']},
                {'mean': sd[key + '.running_mean'],
                 'var': sd[key + '.running_var']})

    for i in range(3):
        p[f'stem_{i}'], bs[f'stem_{i}'] = _convmodule(sd, f'stem.{i}')
        p[f'stem_{i}_act'] = prelu(f'stem.{i}.activate')
    for k in range(3):
        p[f'norm_prelu_{k}_bn'], bs[f'norm_prelu_{k}_bn'] = bnorm(
            f'norm_prelu_{k}.0')
        p[f'norm_prelu_{k}_act'] = prelu(f'norm_prelu_{k}.1')
    for lvl in (1, 2):
        j = 0
        while f'level{lvl}.{j}.conv1x1.conv.weight' in sd:
            pre = f'level{lvl}.{j}.'
            mp: Dict[str, Any] = {}
            mb: Dict[str, Any] = {}
            mp['conv1x1'], mb['conv1x1'] = _convmodule(sd, pre + 'conv1x1')
            mp['conv1x1_act'] = prelu(pre + 'conv1x1.activate')
            for name in ('f_loc', 'f_sur'):
                w = sd[pre + name + '.weight']
                mp[name] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
            mp['bn'], mb['bn'] = bnorm(pre + 'bn')
            mp['activate'] = prelu(pre + 'activate')
            if pre + 'bottleneck.weight' in sd:
                w = sd[pre + 'bottleneck.weight']
                mp['bottleneck'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
            for fc, idx in (('fc1', 0), ('fc2', 2)):
                mp[fc] = {'kernel': sd[pre + f'f_glo.fc.{idx}.weight'].T,
                          'bias': sd[pre + f'f_glo.fc.{idx}.bias']}
            p[f'level{lvl}_{j}'] = mp
            bs[f'level{lvl}_{j}'] = mb
            j += 1
    return p, bs


def convert_icnet_backbone(sd: Dict[str, np.ndarray]
                           ) -> Tuple[Dict, Dict]:
    """mmseg ICNet state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.ICNet layout.

    Reference layout (icnet.py:46-166): nested ``backbone.*`` (ResNet —
    reuses convert_resnet_backbone), ``psp_modules.{i}.1`` per-scale
    ConvModules, ``psp_bottleneck``, ``conv_sub1.{0,1,2}``,
    ``conv_sub2``, ``conv_sub4``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    inner = {k[len('backbone.'):]: v for k, v in sd.items()
             if k.startswith('backbone.')}
    if inner:
        p['backbone'], bs['backbone'] = convert_resnet_backbone(inner)
    i = 0
    while f'psp_modules.{i}.1.conv.weight' in sd:
        p[f'psp_{i}'], bs[f'psp_{i}'] = _convmodule(sd, f'psp_modules.{i}.1')
        i += 1
    for ref, ours in (('psp_bottleneck', 'psp_bottleneck'),
                      ('conv_sub1.0', 'conv_sub1_0'),
                      ('conv_sub1.1', 'conv_sub1_1'),
                      ('conv_sub1.2', 'conv_sub1_2'),
                      ('conv_sub2', 'conv_sub2'),
                      ('conv_sub4', 'conv_sub4')):
        if ref + '.conv.weight' in sd:
            p[ours], bs[ours] = _convmodule(sd, ref)
    return p, bs


def convert_stdc_backbone(sd: Dict[str, np.ndarray],
                          prefix: str = '') -> Tuple[Dict, Dict]:
    """mmseg STDCNet state_dict -> our cnn_zoo.STDCNet layout.

    Reference layout (stdc.py:188-325): ``stages.{0,1}`` shallow
    ConvModules; ``stages.{s}.{j}`` STDCModules — cat type keeps conv_0
    at ``layers.0`` with the stride-2 depthwise at ``downsample``; add
    type nests conv_0 at ``layers.0.0`` (the downsample shares
    ``layers.0.1`` and ``downsample``) and adds ``skip.{0,1}``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    sub = {k[len(prefix):]: v for k, v in sd.items()
           if k.startswith(prefix)} if prefix else sd

    def cm(ref_key, our_key, dst_p=p, dst_b=bs):
        if ref_key + '.conv.weight' in sub:
            dst_p[our_key], dst_b[our_key] = _convmodule(sub, ref_key)
            return True
        return False

    cm('stages.0', 'stages_0')
    cm('stages.1', 'stages_1')
    s = 2
    while f'stages.{s}.0.layers.0.conv.weight' in sub or \
            f'stages.{s}.0.layers.0.0.conv.weight' in sub:
        j = 0
        while True:
            pre = f'stages.{s}.{j}.'
            is_cat = pre + 'layers.0.conv.weight' in sub
            is_add = pre + 'layers.0.0.conv.weight' in sub
            if not (is_cat or is_add):
                break
            mp: Dict[str, Any] = {}
            mb: Dict[str, Any] = {}
            if is_cat:
                cm(pre + 'layers.0', 'layers_0', mp, mb)
            else:
                cm(pre + 'layers.0.0', 'layers_0', mp, mb)
                cm(pre + 'layers.0.1', 'downsample', mp, mb)
            cm(pre + 'downsample', 'downsample', mp, mb)
            k = 1
            while cm(pre + f'layers.{k}', f'layers_{k}', mp, mb):
                k += 1
            for k in (0, 1):
                cm(pre + f'skip.{k}', f'skip_{k}', mp, mb)
            p[f'stages_{s}_{j}'] = mp
            bs[f'stages_{s}_{j}'] = mb
            j += 1
        s += 1
    cm('final_conv', 'final_conv')
    return p, bs


def convert_stdc_context_path(sd: Dict[str, np.ndarray]
                              ) -> Tuple[Dict, Dict]:
    """mmseg STDCContextPathNet state_dict (keys WITHOUT the segmentor's
    'backbone.') -> our cnn_zoo.STDCContextPathNet layout (nested
    STDCNet under 'backbone', ARMs, convs, conv_avg, STDC FFM with
    bias-free no-norm attention convs)."""
    p, bs = convert_stdc_backbone(sd, prefix='backbone.')
    p = {'backbone': p}
    bs = {'backbone': bs}
    for i in (0, 1):
        pre = f'arms.{i}.'
        if pre + 'conv_layer.conv.weight' not in sd:
            continue
        ap: Dict[str, Any] = {}
        ab: Dict[str, Any] = {}
        ap['conv'], ab['conv'] = _convmodule(sd, pre + 'conv_layer')
        w = sd[pre + 'atten_conv_layer.1.conv.weight']
        ap['gate_conv'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        ap['gate_bn'] = {'scale': sd[pre + 'atten_conv_layer.1.bn.weight'],
                         'bias': sd[pre + 'atten_conv_layer.1.bn.bias']}
        ab['gate_bn'] = {
            'mean': sd[pre + 'atten_conv_layer.1.bn.running_mean'],
            'var': sd[pre + 'atten_conv_layer.1.bn.running_var']}
        p[f'arms_{i}'] = ap
        bs[f'arms_{i}'] = ab
        if f'convs.{i}.conv.weight' in sd:
            p[f'convs_{i}'], bs[f'convs_{i}'] = _convmodule(
                sd, f'convs.{i}')
    if 'conv_avg.conv.weight' in sd:
        p['conv_avg'], bs['conv_avg'] = _convmodule(sd, 'conv_avg')
    if 'ffm.conv0.conv.weight' in sd:
        fp: Dict[str, Any] = {}
        fb: Dict[str, Any] = {}
        fp['conv0'], fb['conv0'] = _convmodule(sd, 'ffm.conv0')
        for k, ours in ((1, 'atten_0'), (2, 'atten_1')):
            w = sd[f'ffm.attention.{k}.conv.weight']
            fp[ours] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        p['ffm'] = fp
        bs['ffm'] = fb
    return p, bs


def convert_bisenetv1_backbone(sd: Dict[str, np.ndarray]
                               ) -> Tuple[Dict, Dict]:
    """mmseg BiSeNetV1 state_dict (keys WITHOUT 'backbone.') -> our
    cnn_zoo.BiSeNetV1 layout.

    Reference layout (bisenetv1.py): ``spatial_path.layer{1..4}``
    ConvModules; ``context_path.backbone.*`` (inner ResNet — reuses
    convert_resnet_backbone); ARMs at ``context_path.arm{16,32}``
    (conv_layer + atten_conv_layer.1 bias-free conv+BN);
    ``context_path.conv_head{16,32}``, ``context_path.gap_conv.1``;
    ``ffm.conv1`` + ``ffm.conv_atten.0``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    inner = {k[len('context_path.backbone.'):]: v for k, v in sd.items()
             if k.startswith('context_path.backbone.')}
    if inner:
        p['context_backbone'], bs['context_backbone'] = \
            convert_resnet_backbone(inner)
    for i in range(4):
        key = f'spatial_path.layer{i + 1}'
        if key + '.conv.weight' in sd:
            p[f'spatial_{i}'], bs[f'spatial_{i}'] = _convmodule(sd, key)
    for arm in ('arm16', 'arm32'):
        pre = f'context_path.{arm}.'
        if pre + 'conv_layer.conv.weight' not in sd:
            continue
        ap: Dict[str, Any] = {}
        ab: Dict[str, Any] = {}
        ap['conv'], ab['conv'] = _convmodule(sd, pre + 'conv_layer')
        w = sd[pre + 'atten_conv_layer.1.conv.weight']
        ap['gate_conv'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        ap['gate_bn'] = {'scale': sd[pre + 'atten_conv_layer.1.bn.weight'],
                         'bias': sd[pre + 'atten_conv_layer.1.bn.bias']}
        ab['gate_bn'] = {
            'mean': sd[pre + 'atten_conv_layer.1.bn.running_mean'],
            'var': sd[pre + 'atten_conv_layer.1.bn.running_var']}
        p[arm] = ap
        bs[arm] = ab
    for ref, ours in (('context_path.conv_head32', 'refine32'),
                      ('context_path.conv_head16', 'refine16'),
                      ('context_path.gap_conv.1', 'gap_conv')):
        if ref + '.conv.weight' in sd:
            p[ours], bs[ours] = _convmodule(sd, ref)
    if 'ffm.conv1.conv.weight' in sd:
        fp: Dict[str, Any] = {}
        fb: Dict[str, Any] = {}
        fp['conv'], fb['conv'] = _convmodule(sd, 'ffm.conv1')
        fp['atten'], fb['atten'] = _convmodule(sd, 'ffm.conv_atten.0')
        p['ffm'] = fp
        bs['ffm'] = fb
    return p, bs


def convert_cc_head(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg CCHead (cc_head.py: FCNHead(num_convs=2) + mmcv
    CrissCrossAttention between the convs) -> extra_heads.CCHead.

    mmcv cc_attention.py layout: ``cca.{query,key,value}_conv`` (biased
    1x1 Conv2d) + ``cca.gamma.scale`` (mmcv Scale wrapper, scalar)."""
    p, bs = convert_fcn_head(sd, prefix)
    cca: Dict[str, Any] = {}
    for name in ('query', 'key', 'value'):
        w = sd[prefix + f'cca.{name}_conv.weight']
        cca[name] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                     'bias': sd[prefix + f'cca.{name}_conv.bias']}
    cca['gamma'] = np.asarray(sd[prefix + 'cca.gamma.scale']).reshape(())
    p['cca'] = cca
    return p, bs


def convert_segmenter_mask_head(sd: Dict[str, np.ndarray], prefix: str = ''
                                ) -> Tuple[Dict, Dict]:
    """mmseg SegmenterMaskTransformerHead (segmenter_mask_head.py:85-99)
    -> extra_heads.SegmenterMaskTransformerHead.

    ``layers.{i}`` are the same mmcv TransformerEncoderLayer blocks as the
    ViT backbone (ln1/attn.attn.in_proj/out_proj/ln2/ffn.layers), mapped
    UNSTACKED onto ``layers_{i}`` (the head is a plain loop, not a scan);
    plus dec_proj/cls_emb/patch_proj/classes_proj/decoder_norm/mask_norm."""
    p: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]  # noqa: E731
    p['dec_proj'] = {'kernel': g('dec_proj.weight').T,
                     'bias': g('dec_proj.bias')}
    p['cls_emb'] = g('cls_emb')
    p['patch_proj'] = {'kernel': g('patch_proj.weight').T}
    p['classes_proj'] = {'kernel': g('classes_proj.weight').T}
    p['decoder_norm'] = {'scale': g('decoder_norm.weight'),
                         'bias': g('decoder_norm.bias')}
    p['mask_norm'] = {'scale': g('mask_norm.weight'),
                      'bias': g('mask_norm.bias')}
    i = 0
    while prefix + f'layers.{i}.ln1.weight' in sd:
        pre = prefix + f'layers.{i}.'
        blk = {
            'ln1': {'scale': sd[pre + 'ln1.weight'],
                    'bias': sd[pre + 'ln1.bias']},
            'ln2': {'scale': sd[pre + 'ln2.weight'],
                    'bias': sd[pre + 'ln2.bias']},
            'attn': {
                'qkv': {'kernel': sd[pre + 'attn.attn.in_proj_weight'].T},
                'proj': {
                    'kernel': sd[pre + 'attn.attn.out_proj.weight'].T,
                    'bias': sd[pre + 'attn.attn.out_proj.bias']},
            },
            'ffn': {
                'fc1': {'kernel': sd[pre + 'ffn.layers.0.0.weight'].T,
                        'bias': sd[pre + 'ffn.layers.0.0.bias']},
                'fc2': {'kernel': sd[pre + 'ffn.layers.1.weight'].T,
                        'bias': sd[pre + 'ffn.layers.1.bias']},
            },
        }
        if pre + 'attn.attn.in_proj_bias' in sd:
            blk['attn']['qkv']['bias'] = sd[pre + 'attn.attn.in_proj_bias']
        p[f'layers_{i}'] = blk
        i += 1
    return p, {}


def convert_mla_neck(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg MLANeck (mla_neck.py: norm.{i} token LNs +
    mla.channel_proj.{i} / mla.feat_extract.{i} biased no-norm
    ConvModules) -> necks.MLANeck."""
    p: Dict[str, Any] = {}
    i = 0
    while prefix + f'norm.{i}.weight' in sd:
        p[f'norm_{i}'] = {'scale': sd[prefix + f'norm.{i}.weight'],
                          'bias': sd[prefix + f'norm.{i}.bias']}
        i += 1
    for ref, ours in (('mla.channel_proj', 'proj'),
                      ('mla.feat_extract', 'feat')):
        i = 0
        while prefix + f'{ref}.{i}.conv.weight' in sd:
            w = sd[prefix + f'{ref}.{i}.conv.weight']
            p[f'{ours}_{i}'] = {
                'kernel': np.transpose(w, (2, 3, 1, 0)),
                'bias': sd[prefix + f'{ref}.{i}.conv.bias']}
            i += 1
    return p, {}


def convert_setr_mla_head(sd: Dict[str, np.ndarray], prefix: str = ''
                          ) -> Tuple[Dict, Dict]:
    """mmseg SETRMLAHead (setr_mla_head.py: per-level Sequential of TWO
    3x3 ConvModules + param-free Upsample) -> misc_heads.SETRMLAHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'up_convs.{i}.0.conv.weight' in sd:
        p[f'up_conv_{i}_a'], bs[f'up_conv_{i}_a'] = _convmodule(
            sd, prefix + f'up_convs.{i}.0')
        p[f'up_conv_{i}_b'], bs[f'up_conv_{i}_b'] = _convmodule(
            sd, prefix + f'up_convs.{i}.1')
        i += 1
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_multilevel_neck(sd: Dict[str, np.ndarray], prefix: str = ''
                            ) -> Tuple[Dict, Dict]:
    """mmseg MultiLevelNeck (multilevel_neck.py: biased lateral_convs +
    convs) -> necks.MultiLevelNeck."""
    p: Dict[str, Any] = {}
    for ref, ours in (('lateral_convs', 'lateral'), ('convs', 'conv')):
        i = 0
        while prefix + f'{ref}.{i}.conv.weight' in sd:
            p[f'{ours}_{i}'] = _biased_conv(sd, prefix + f'{ref}.{i}.conv')
            i += 1
    return p, {}


def convert_feature2pyramid_neck(sd: Dict[str, np.ndarray],
                                 prefix: str = '') -> Tuple[Dict, Dict]:
    """mmseg Feature2Pyramid (featurepyramid.py: upsample_4x Sequential
    [deconv, norm, GELU, deconv] + upsample_2x deconv) ->
    necks.Feature2Pyramid (deconvs transpose+flip)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def deconv(key):
        w = sd[key + '.weight']
        return {'kernel': np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy(),
                'bias': sd[key + '.bias']}

    if prefix + 'upsample_4x.0.weight' in sd:
        p['up4_deconv1'] = deconv(prefix + 'upsample_4x.0')
        p['up4_bn'] = {'scale': sd[prefix + 'upsample_4x.1.weight'],
                       'bias': sd[prefix + 'upsample_4x.1.bias']}
        bs['up4_bn'] = {
            'mean': sd[prefix + 'upsample_4x.1.running_mean'],
            'var': sd[prefix + 'upsample_4x.1.running_var']}
        p['up4_deconv2'] = deconv(prefix + 'upsample_4x.3')
    if prefix + 'upsample_2x.0.weight' in sd:
        p['up2_deconv'] = deconv(prefix + 'upsample_2x.0')
    return p, bs


def convert_jpu_neck(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg JPU (jpu.py: conv_layers.{i}.0 ConvModules +
    dilation_layers.{i}.0 DW-separable modules) -> necks.JPU."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'conv_layers.{i}.0.conv.weight' in sd:
        p[f'conv_{i}'], bs[f'conv_{i}'] = _convmodule(
            sd, prefix + f'conv_layers.{i}.0')
        i += 1
    i = 0
    while prefix + f'dilation_layers.{i}.0.depthwise_conv.conv.weight' \
            in sd:
        p[f'dilation_{i}'], bs[f'dilation_{i}'] = _sepconvmodule(
            sd, prefix + f'dilation_layers.{i}.0')
        i += 1
    return p, bs


def convert_ic_neck(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg ICNeck (ic_neck.py: cff_24/cff_12 CascadeFeatureFusions
    with dilated conv_low + 1x1 conv_high ConvModules) -> necks.ICNeck."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for cff in ('cff_24', 'cff_12'):
        cp: Dict[str, Any] = {}
        cb: Dict[str, Any] = {}
        for sub in ('conv_low', 'conv_high'):
            cp[sub], cb[sub] = _convmodule(sd, prefix + f'{cff}.{sub}')
        p[cff] = cp
        bs[cff] = cb
    return p, bs


def convert_fpn_neck(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg/mmdet FPN neck (necks/fpn.py: biased ConvModules, no norm)
    -> necks.FPN (``lateral_{i}``/``fpn_{i}``)."""
    p: Dict[str, Any] = {}
    for ref, ours in (('lateral_convs', 'lateral'), ('fpn_convs', 'fpn')):
        i = 0
        while prefix + f'{ref}.{i}.conv.weight' in sd:
            w = sd[prefix + f'{ref}.{i}.conv.weight']
            p[f'{ours}_{i}'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                                'bias': sd[prefix + f'{ref}.{i}.conv.bias']}
            i += 1
    return p, {}


def convert_fpn_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg FPNHead (fpn_head.py: per-level ``scale_heads.{i}`` —
    Sequential of ConvModule [+ param-free Upsample] pairs, so ConvModule
    slots are 0, 2, 4, ...) -> extra_heads.FPNHead
    (``scale_heads_{i}_{k}``)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'scale_heads.{i}.0.conv.weight' in sd:
        k = 0
        for j in range(32):
            key = prefix + f'scale_heads.{i}.{j}'
            if key + '.conv.weight' in sd:
                p[f'scale_heads_{i}_{k}'], bs[f'scale_heads_{i}_{k}'] = \
                    _convmodule(sd, key)
                k += 1
        i += 1
    _conv_seg(sd, prefix, p)
    return p, bs


def _biased_conv(sd, key):
    w = sd[key + '.weight']
    out = {'kernel': np.transpose(w, (2, 3, 1, 0))}
    if key + '.bias' in sd:
        out['bias'] = sd[key + '.bias']
    return out


def _nonlocal_block(sd, pre):
    """mmcv NonLocal2d subtree -> our NonLocal2d / DNL _block names."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for name in ('theta', 'phi', 'g'):
        p[name] = _biased_conv(sd, pre + name + '.conv')
    p['conv_out'] = {'kernel': np.transpose(
        sd[pre + 'conv_out.conv.weight'], (2, 3, 1, 0))}
    p['bn_out'] = {'scale': sd[pre + 'conv_out.bn.weight'],
                   'bias': sd[pre + 'conv_out.bn.bias']}
    bs['bn_out'] = {'mean': sd[pre + 'conv_out.bn.running_mean'],
                    'var': sd[pre + 'conv_out.bn.running_var']}
    if pre + 'conv_mask.weight' in sd:           # DNL unary branch
        p['conv_mask'] = _biased_conv(sd, pre + 'conv_mask')
    return p, bs


def convert_nl_head(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg NLHead / DNLHead (nl_head.py / dnl_head.py: FCNHead
    num_convs=2 with an (disentangled) non-local block between the
    convs) -> zoo_heads.{NLHead,DNLHead}. The DNL variant's block params
    land directly on the head (its _block is inline), the NL variant's
    under ``nl_block``."""
    p, bs = convert_fcn_head(sd, prefix)
    if prefix + 'dnl_block.theta.conv.weight' in sd:
        bp, bb = _nonlocal_block(sd, prefix + 'dnl_block.')
        p.update(bp)
        bs.update(bb)
    elif prefix + 'nl_block.theta.conv.weight' in sd:
        p['nl_block'], bs['nl_block'] = _nonlocal_block(
            sd, prefix + 'nl_block.')
    return p, bs


def convert_gc_head(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg GCHead (gc_head.py + mmcv ContextBlock: conv_mask +
    channel_add_conv Sequential [conv, LN([c,1,1]), ReLU, conv]) ->
    zoo_heads.GCHead."""
    p, bs = convert_fcn_head(sd, prefix)
    g = prefix + 'gc_block.'
    p['conv_mask'] = _biased_conv(sd, g + 'conv_mask')
    w0 = sd[g + 'channel_add_conv.0.weight']     # [ci, C, 1, 1]
    p['add_conv_0'] = {'kernel': w0[:, :, 0, 0].T,
                       'bias': sd[g + 'channel_add_conv.0.bias']}
    p['add_ln'] = {
        'scale': sd[g + 'channel_add_conv.1.weight'].reshape(-1),
        'bias': sd[g + 'channel_add_conv.1.bias'].reshape(-1)}
    w1 = sd[g + 'channel_add_conv.3.weight']
    p['add_conv_1'] = {'kernel': w1[:, :, 0, 0].T,
                       'bias': sd[g + 'channel_add_conv.3.bias']}
    return p, bs


def convert_apc_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg APCHead (apc_head.py: acm_modules.{i} with pooled/input
    redu ConvModules, biased gla conv, global_info, residual/fusion
    convs) -> zoo_heads.APCHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'acm_modules.{i}.gla.weight' in sd:
        pre = prefix + f'acm_modules.{i}.'
        for ref, ours in (('pooled_redu_conv', f'acm_{i}_pooled_redu'),
                          ('input_redu_conv', f'acm_{i}_input_redu'),
                          ('global_info', f'acm_{i}_global'),
                          ('residual_conv', f'acm_{i}_residual'),
                          ('fusion_conv', f'acm_{i}_fusion')):
            if pre + ref + '.conv.weight' in sd:
                p[ours], bs[ours] = _convmodule(sd, pre + ref)
        p[f'acm_{i}_gla'] = _biased_conv(sd, pre + 'gla')
        i += 1
    if prefix + 'bottleneck.conv.weight' in sd:
        p['bottleneck'], bs['bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_dm_head(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg DMHead (dm_head.py: dcm_modules.{i} with biased
    filter_gen_conv, input_redu ConvModule, standalone BN ``norm``,
    optional fusion conv) -> zoo_heads.DMHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'dcm_modules.{i}.filter_gen_conv.weight' in sd:
        pre = prefix + f'dcm_modules.{i}.'
        p[f'dcm_{i}_filter_gen'] = _biased_conv(sd, pre + 'filter_gen_conv')
        p[f'dcm_{i}_input_redu'], bs[f'dcm_{i}_input_redu'] = _convmodule(
            sd, pre + 'input_redu_conv')
        p[f'dcm_{i}_norm'] = {'scale': sd[pre + 'norm.weight'],
                              'bias': sd[pre + 'norm.bias']}
        bs[f'dcm_{i}_norm'] = {'mean': sd[pre + 'norm.running_mean'],
                               'var': sd[pre + 'norm.running_var']}
        if pre + 'fusion_conv.conv.weight' in sd:
            p[f'dcm_{i}_fusion'], bs[f'dcm_{i}_fusion'] = _convmodule(
                sd, pre + 'fusion_conv')
        i += 1
    if prefix + 'bottleneck.conv.weight' in sd:
        p['bottleneck'], bs['bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_ema_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg EMAHead (ema_head.py: ema_in/mid/out convs, the
    ``ema_module.bases`` [1, C, K] buffer -> our [1, K, C] batch_stats,
    bottleneck, conv_cat) -> zoo_heads.EMAHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p['ema_in'], bs['ema_in'] = _convmodule(sd, prefix + 'ema_in_conv')
    p['ema_mid'] = _biased_conv(sd, prefix + 'ema_mid_conv.conv')
    bs['bases'] = np.transpose(sd[prefix + 'ema_module.bases'], (0, 2, 1))
    p['ema_out'] = {'kernel': np.transpose(
        sd[prefix + 'ema_out_conv.conv.weight'], (2, 3, 1, 0))}
    p['ema_out_bn'] = {'scale': sd[prefix + 'ema_out_conv.bn.weight'],
                       'bias': sd[prefix + 'ema_out_conv.bn.bias']}
    bs['ema_out_bn'] = {
        'mean': sd[prefix + 'ema_out_conv.bn.running_mean'],
        'var': sd[prefix + 'ema_out_conv.bn.running_var']}
    p['bottleneck'], bs['bottleneck'] = _convmodule(
        sd, prefix + 'bottleneck')
    if prefix + 'conv_cat.conv.weight' in sd:
        p['conv_cat'], bs['conv_cat'] = _convmodule(sd, prefix + 'conv_cat')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_ann_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg ANNHead (ann_head.py: AFNB fusion.stages.{i} + act-free
    fusion.bottleneck; 3x3 bottleneck; APNB context.stages.{i} with
    SHARED query/key projection + context.bottleneck) ->
    zoo_heads.ANNHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'fusion.stages.{i}.key_project.conv.weight' in sd:
        pre = prefix + f'fusion.stages.{i}.'
        p[f'fusion_{i}_query'], bs[f'fusion_{i}_query'] = _convmodule(
            sd, pre + 'query_project')
        p[f'fusion_{i}_key'], bs[f'fusion_{i}_key'] = _convmodule(
            sd, pre + 'key_project')
        p[f'fusion_{i}_value'] = _biased_conv(sd, pre + 'value_project')
        p[f'fusion_{i}_out'] = _biased_conv(sd, pre + 'out_project')
        i += 1
    w = sd[prefix + 'fusion.bottleneck.conv.weight']
    p['fusion_bottleneck'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
    p['fusion_bottleneck_bn'] = {
        'scale': sd[prefix + 'fusion.bottleneck.bn.weight'],
        'bias': sd[prefix + 'fusion.bottleneck.bn.bias']}
    bs['fusion_bottleneck_bn'] = {
        'mean': sd[prefix + 'fusion.bottleneck.bn.running_mean'],
        'var': sd[prefix + 'fusion.bottleneck.bn.running_var']}
    p['bottleneck'], bs['bottleneck'] = _convmodule(
        sd, prefix + 'bottleneck')
    i = 0
    while prefix + f'context.stages.{i}.key_project.conv.weight' in sd:
        pre = prefix + f'context.stages.{i}.'
        # query_project IS key_project (share_key_query=True)
        p[f'context_{i}_key'], bs[f'context_{i}_key'] = _convmodule(
            sd, pre + 'key_project')
        p[f'context_{i}_value'] = _biased_conv(sd, pre + 'value_project')
        p[f'context_{i}_out'] = _biased_conv(sd, pre + 'out_project')
        i += 1
    p['context_bottleneck'], bs['context_bottleneck'] = _convmodule(
        sd, prefix + 'context.bottleneck')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_daformer_head(sd: Dict[str, np.ndarray], prefix: str = ''
                          ) -> Tuple[Dict, Dict]:
    """mmseg/S4Former DAFormerHead (daformer_head.py: embed_layers.{i}
    MLP Linears, fuse_layer ASPPWrapper [plain/DS aspp_modules + 3x3
    bottleneck]) -> advanced_heads.DAFormerHead (canonical mlp+aspp)."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'embed_layers.{i}.proj.weight' in sd:
        p[f'embed_{i}'] = {
            'kernel': sd[prefix + f'embed_layers.{i}.proj.weight'].T,
            'bias': sd[prefix + f'embed_layers.{i}.proj.bias']}
        i += 1
    i = 0
    while True:
        key = prefix + f'fuse_layer.aspp_modules.{i}'
        if key + '.conv.weight' in sd:
            p[f'fuse_{i}'], bs[f'fuse_{i}'] = _convmodule(sd, key)
        elif key + '.depthwise_conv.conv.weight' in sd:
            p[f'fuse_{i}'], bs[f'fuse_{i}'] = _sepconvmodule(sd, key)
        else:
            break
        i += 1
    if prefix + 'fuse_layer.image_pool.1.conv.weight' in sd:
        p['fuse_pool'], bs['fuse_pool'] = _convmodule(
            sd, prefix + 'fuse_layer.image_pool.1')
    p['fuse_bottleneck'], bs['fuse_bottleneck'] = _convmodule(
        sd, prefix + 'fuse_layer.bottleneck')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_dpt_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg DPTHead (dpt_head.py: reassemble projects + parametric
    resize layers [deconvs map via transpose(2,3,0,1) + double spatial
    flip], bias-free convs, fusion blocks with pre-act residual units,
    biased fusion projects, final ConvModule) -> advanced_heads.DPTHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    r = prefix + 'reassemble_blocks.'
    i = 0
    while r + f'projects.{i}.conv.weight' in sd:
        p[f'reassemble_{i}'] = _biased_conv(sd, r + f'projects.{i}.conv')
        i += 1
    for j in (0, 1):
        w = sd[r + f'resize_layers.{j}.weight']   # deconv [Cin,Cout,k,k]
        p[f'resize_{j}'] = {
            'kernel': np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy(),
            'bias': sd[r + f'resize_layers.{j}.bias']}
    p['resize_3'] = _biased_conv(sd, r + 'resize_layers.3')
    i = 0
    while prefix + f'convs.{i}.conv.weight' in sd:
        w = sd[prefix + f'convs.{i}.conv.weight']
        p[f'convs_{i}'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        i += 1

    def rcu(key, ours):
        rp: Dict[str, Any] = {}
        rb: Dict[str, Any] = {}
        for n in (1, 2):
            w = sd[key + f'.conv{n}.conv.weight']
            rp[f'conv{n}'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
            rp[f'bn{n}'] = {'scale': sd[key + f'.conv{n}.bn.weight'],
                            'bias': sd[key + f'.conv{n}.bn.bias']}
            rb[f'bn{n}'] = {
                'mean': sd[key + f'.conv{n}.bn.running_mean'],
                'var': sd[key + f'.conv{n}.bn.running_var']}
        p[ours] = rp
        bs[ours] = rb

    i = 0
    while prefix + f'fusion_blocks.{i}.project.conv.weight' in sd:
        pre = prefix + f'fusion_blocks.{i}.'
        if pre + 'res_conv_unit1.conv1.conv.weight' in sd:
            rcu(pre + 'res_conv_unit1', f'fusion_{i}_rcu1')
        rcu(pre + 'res_conv_unit2', f'fusion_{i}_rcu2')
        p[f'fusion_{i}_project'] = _biased_conv(sd, pre + 'project.conv')
        i += 1
    p['project'], bs['project'] = _convmodule(sd, prefix + 'project')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_psa_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg PSAHead (psa_head.py: reduce(+_p) ConvModules, attention
    Sequentials [ConvModule, bias-free conv to mask_h*mask_w], quirky
    padded 1x1 proj, bottleneck) -> zoo_heads.PSAHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for ref, ours in (('reduce', 'reduce'), ('reduce_p', 'reduce_p'),
                      ('proj', 'proj'), ('bottleneck', 'bottleneck')):
        if prefix + ref + '.conv.weight' in sd:
            p[ours], bs[ours] = _convmodule(sd, prefix + ref)
    for att in ('attention', 'attention_p'):
        if prefix + att + '.0.conv.weight' in sd:
            p[f'{att}_0'], bs[f'{att}_0'] = _convmodule(
                sd, prefix + att + '.0')
            w = sd[prefix + att + '.1.weight']
            p[f'{att}_1'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_enc_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg EncHead (enc_head.py: bottleneck + laterals/fusion +
    EncModule [encoding_project, Encoding codewords/scale, BN1d over
    codes, fc Linear] + se_layer) -> zoo_heads.EncHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p['bottleneck'], bs['bottleneck'] = _convmodule(
        sd, prefix + 'bottleneck')
    i = 0
    while prefix + f'lateral_convs.{i}.conv.weight' in sd:
        p[f'lateral_{i}'], bs[f'lateral_{i}'] = _convmodule(
            sd, prefix + f'lateral_convs.{i}')
        i += 1
    if prefix + 'fusion.conv.weight' in sd:
        p['fusion'], bs['fusion'] = _convmodule(sd, prefix + 'fusion')
    e = prefix + 'enc_module.'
    p['encoding_project'], bs['encoding_project'] = _convmodule(
        sd, e + 'encoding_project')
    p['encoding'] = {'codewords': sd[e + 'encoding.0.codewords'],
                     'scale': sd[e + 'encoding.0.scale']}
    p['enc_bn'] = {'scale': sd[e + 'encoding.1.weight'],
                   'bias': sd[e + 'encoding.1.bias']}
    bs['enc_bn'] = {'mean': sd[e + 'encoding.1.running_mean'],
                    'var': sd[e + 'encoding.1.running_var']}
    p['fc'] = {'kernel': sd[e + 'fc.0.weight'].T,
               'bias': sd[e + 'fc.0.bias']}
    if prefix + 'se_layer.weight' in sd:
        p['se_layer'] = {'kernel': sd[prefix + 'se_layer.weight'].T,
                         'bias': sd[prefix + 'se_layer.bias']}
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_isa_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg ISAHead (isa_head.py: in_conv; global/local SelfAttention
    blocks with 2-conv query/key projections, plain biased
    value_project, ConvModule output_project; out_conv) ->
    zoo_heads.ISAHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p['in_conv'], bs['in_conv'] = _convmodule(sd, prefix + 'in_conv')
    for rel in ('global_relation', 'local_relation'):
        pre = prefix + rel + '.'
        for proj in ('query', 'key'):
            for i in (0, 1):
                p[f'{rel}_{proj}_{i}'], bs[f'{rel}_{proj}_{i}'] = \
                    _convmodule(sd, pre + f'{proj}_project.{i}')
        p[f'{rel}_value'] = _biased_conv(sd, pre + 'value_project')
        p[f'{rel}_output'], bs[f'{rel}_output'] = _convmodule(
            sd, pre + 'output_project')
    p['out_conv'], bs['out_conv'] = _convmodule(sd, prefix + 'out_conv')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_da_head(sd: Dict[str, np.ndarray], prefix: str = ''
                    ) -> Tuple[Dict, Dict]:
    """mmseg DAHead (da_head.py: pam/cam in/out ConvModules, PAM's plain
    biased query/key/value projections + Scale gammas, per-branch
    pam/cam_conv_seg classifiers) -> zoo_heads.DAHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for ref, ours in (('pam_in_conv', 'pam_in'),
                      ('pam_out_conv', 'pam_out'),
                      ('cam_in_conv', 'cam_in'),
                      ('cam_out_conv', 'cam_out')):
        p[ours], bs[ours] = _convmodule(sd, prefix + ref)
    for ref, ours in (('pam.query_project', 'pam_q'),
                      ('pam.key_project', 'pam_k'),
                      ('pam.value_project', 'pam_v')):
        p[ours] = _biased_conv(sd, prefix + ref)
    p['pam_gamma'] = np.asarray(
        sd[prefix + 'pam.gamma.scale']).reshape(())
    p['cam_gamma'] = np.asarray(
        sd[prefix + 'cam.gamma.scale']).reshape(())
    for name in ('pam_conv_seg', 'cam_conv_seg'):
        p[name] = _biased_conv(sd, prefix + name)
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_sep_fcn_head(sd: Dict[str, np.ndarray], prefix: str = ''
                         ) -> Tuple[Dict, Dict]:
    """mmseg DepthwiseSeparableFCNHead (sep_fcn_head.py: every conv a
    DepthwiseSeparableConvModule) -> zoo_heads.DepthwiseSeparableFCNHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'convs.{i}.depthwise_conv.conv.weight' in sd:
        p[f'convs_{i}'], bs[f'convs_{i}'] = _sepconvmodule(
            sd, prefix + f'convs.{i}')
        i += 1
    if prefix + 'conv_cat.depthwise_conv.conv.weight' in sd:
        p['conv_cat'], bs['conv_cat'] = _sepconvmodule(
            sd, prefix + 'conv_cat')
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_lraspp_head(sd: Dict[str, np.ndarray], prefix: str = ''
                        ) -> Tuple[Dict, Dict]:
    """mmseg LRASPPHead (lraspp_head.py: ``convs.conv{i}`` bias-free skip
    convs, ``conv_ups.conv_up{i}`` ConvModules, biased ``conv_up_input``,
    ``aspp_conv`` ConvModule, ``image_pool.1`` bias-free no-norm conv)
    -> zoo_heads.LRASPPHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    i = 0
    while prefix + f'convs.conv{i}.weight' in sd:
        w = sd[prefix + f'convs.conv{i}.weight']
        p[f'convs_{i}'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
        p[f'conv_ups_{i}'], bs[f'conv_ups_{i}'] = _convmodule(
            sd, prefix + f'conv_ups.conv_up{i}')
        i += 1
    w = sd[prefix + 'conv_up_input.weight']
    p['conv_up_input'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                          'bias': sd[prefix + 'conv_up_input.bias']}
    p['aspp_conv'], bs['aspp_conv'] = _convmodule(sd, prefix + 'aspp_conv')
    w = sd[prefix + 'image_pool.1.conv.weight']
    p['image_pool_conv'] = {'kernel': np.transpose(w, (2, 3, 1, 0))}
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_ocr_head(sd: Dict[str, np.ndarray], prefix: str = ''
                     ) -> Tuple[Dict, Dict]:
    """mmseg OCRHead (ocr_head.py:85-130) -> misc_heads.OCRHead.

    Layout: ``bottleneck`` ConvModule; ``object_context_block`` with
    2-conv ``query_project``/``key_project`` Sequentials, single-module
    ``value_project``/``out_project`` (no ``.0`` index — mmseg's
    build_project returns the bare ConvModule for num_convs=1), and its
    own fusion ``bottleneck``; ``conv_seg``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    if prefix + 'bottleneck.conv.weight' in sd:
        p['bottleneck'], bs['bottleneck'] = _convmodule(
            sd, prefix + 'bottleneck')
    ocb = prefix + 'object_context_block.'
    for ref, ours in (('query_project.0', 'ocb_query_0'),
                      ('query_project.1', 'ocb_query_1'),
                      ('key_project.0', 'ocb_key_0'),
                      ('key_project.1', 'ocb_key_1'),
                      ('value_project', 'ocb_value'),
                      ('out_project', 'ocb_out'),
                      ('bottleneck', 'ocb_bottleneck')):
        if ocb + ref + '.conv.weight' in sd:
            p[ours], bs[ours] = _convmodule(sd, ocb + ref)
    _conv_seg(sd, prefix, p)
    return p, bs


def convert_setr_up_head(sd: Dict[str, np.ndarray], prefix: str = ''
                         ) -> Tuple[Dict, Dict]:
    """mmseg SETRUPHead state_dict -> (params, batch_stats) subtrees."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]  # noqa: E731
    if prefix + 'norm.weight' in sd:
        p['norm'] = {'scale': g('norm.weight'), 'bias': g('norm.bias')}
    i = 0
    while prefix + f'up_convs.{i}.0.conv.weight' in sd:
        w = g(f'up_convs.{i}.0.conv.weight')  # [Cout,Cin,k,k]
        p[f'up_convs_{i}'] = {
            'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
            'bn': {'scale': g(f'up_convs.{i}.0.bn.weight'),
                   'bias': g(f'up_convs.{i}.0.bn.bias')},
        }
        bs[f'up_convs_{i}'] = {
            'bn': {'mean': g(f'up_convs.{i}.0.bn.running_mean'),
                   'var': g(f'up_convs.{i}.0.bn.running_var')},
        }
        i += 1
    if prefix + 'conv_seg.weight' in sd:
        w = g('conv_seg.weight')
        p['conv_seg'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                         'bias': g('conv_seg.bias')}
    return p, bs


def convert_any_head(hd):
    # same layout detection for main/aux/EMA head subtrees (a full
    # SegFormer EncoderDecoder checkpoint carries SegformerHead aux/EMA
    # twins; blindly running them through the SETR converter produced
    # empty subtrees that merge_pretrained silently skipped)
    if 'fusion_conv.conv.weight' in hd:      # SegformerHead layout
        return convert_segformer_head(hd)
    if 'scale_heads.0.0.conv.weight' in hd:  # FPNHead (semantic FPN)
        return convert_fpn_head(hd)
    if 'cls_emb' in hd:                      # Segmenter mask head
        return convert_segmenter_mask_head(hd)
    if 'up_convs.0.1.conv.weight' in hd:     # SETR-MLA (before PUP:
        return convert_setr_mla_head(hd)     # PUP has one conv/level)
    if 'lateral_convs.0.conv.weight' in hd:  # UPerHead
        return convert_uper_head(hd)
    if 'psp_modules.0.1.conv.weight' in hd:  # PSPHead
        return convert_psp_head(hd)
    if 'aspp_modules.0.conv.weight' in hd:   # ASPP / DS-ASPP
        return convert_aspp_head(hd)
    if 'object_context_block.bottleneck.conv.weight' in hd:  # OCR
        return convert_ocr_head(hd)
    if 'cca.query_conv.weight' in hd:        # CCHead (before FCN)
        return convert_cc_head(hd)
    if 'convs.0.depthwise_conv.conv.weight' in hd:  # sep-FCN
        return convert_sep_fcn_head(hd)
    if 'conv_up_input.weight' in hd:         # LRASPP
        return convert_lraspp_head(hd)
    if 'nl_block.theta.conv.weight' in hd or \
            'dnl_block.theta.conv.weight' in hd:  # NL / DNL
        return convert_nl_head(hd)
    if 'gc_block.conv_mask.weight' in hd:    # GCNet
        return convert_gc_head(hd)
    if 'acm_modules.0.gla.weight' in hd:     # APCNet
        return convert_apc_head(hd)
    if 'ema_module.bases' in hd:             # EMANet
        return convert_ema_head(hd)
    if 'global_relation.value_project.weight' in hd:  # ISA
        return convert_isa_head(hd)
    if 'pam.gamma.scale' in hd:              # DANet
        return convert_da_head(hd)
    if 'fusion.stages.0.key_project.conv.weight' in hd:  # ANN
        return convert_ann_head(hd)
    if 'enc_module.encoding.0.codewords' in hd:  # EncNet
        return convert_enc_head(hd)
    if 'attention.1.weight' in hd:           # PSANet
        return convert_psa_head(hd)
    if 'reassemble_blocks.projects.0.conv.weight' in hd:  # DPT
        return convert_dpt_head(hd)
    if 'embed_layers.0.proj.weight' in hd:   # DAFormer
        return convert_daformer_head(hd)
    if 'dcm_modules.0.filter_gen_conv.weight' in hd:  # DMNet
        return convert_dm_head(hd)
    if 'kernel_update_head.0.fc_mask.weight' in hd:  # K-Net
        return convert_knet_head(hd)
    if 'fcs.0.conv.weight' in hd:            # PointRend point head
        return convert_point_head(hd)
    if 'convs.0.conv.weight' in hd:          # FCNHead (also STDCHead)
        return convert_fcn_head(hd)
    return convert_setr_up_head(hd)


def convert_feature_contrast(sd: Dict[str, np.ndarray], prefix: str = ''
                             ) -> Tuple[Dict, Dict]:
    """S4Former FeatureContrast (feature_contrast.py:13-190): per-class
    selector MLPs stacked onto the class axis; the memory_bank /
    memory_saved buffers are carried OUTSIDE the module (semi/
    feature_memory.py state), so they are not converted here."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for tower, ref in (('selector', 'contrastive_class_selector_'),
                       ('selector_memory',
                        'contrastive_class_selector_memory')):
        c = 0
        w1, b1, bn_s, bn_b, bn_m, bn_v, w2, b2 = ([] for _ in range(8))
        while prefix + f'Selectors_head.{ref}{c}.0.weight' in sd:
            pre = prefix + f'Selectors_head.{ref}{c}.'
            w1.append(sd[pre + '0.weight'].T)
            b1.append(sd[pre + '0.bias'])
            bn_s.append(sd[pre + '1.weight'])
            bn_b.append(sd[pre + '1.bias'])
            bn_m.append(sd[pre + '1.running_mean'])
            bn_v.append(sd[pre + '1.running_var'])
            w2.append(sd[pre + '3.weight'].T)
            b2.append(sd[pre + '3.bias'])
            c += 1
        if not c:
            continue
        p[f'{tower}_fc1_kernel'] = np.stack(w1)
        p[f'{tower}_fc1_bias'] = np.stack(b1)
        p[f'{tower}_bn_scale'] = np.stack(bn_s)
        p[f'{tower}_bn_bias'] = np.stack(bn_b)
        bs[f'{tower}_bn_mean'] = np.stack(bn_m)
        bs[f'{tower}_bn_var'] = np.stack(bn_v)
        p[f'{tower}_fc2_kernel'] = np.stack(w2)
        p[f'{tower}_fc2_bias'] = np.stack(b2)
    return p, bs


def convert_projection_head(sd: Dict[str, np.ndarray], prefix: str = ''
                            ) -> Tuple[Dict, Dict]:
    """S4Former ProjectionHead (projection_head.py:10-60: proj/predict
    towers of Linear+BN1d+ReLU+Linear) -> projection.ProjectionHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for tower in ('proj', 'predict'):
        for idx, ours in ((0, f'{tower}_fc1'), (3, f'{tower}_fc2')):
            p[ours] = {'kernel': sd[prefix + f'{tower}.{idx}.weight'].T,
                       'bias': sd[prefix + f'{tower}.{idx}.bias']}
        p[f'{tower}_bn'] = {'scale': sd[prefix + f'{tower}.1.weight'],
                            'bias': sd[prefix + f'{tower}.1.bias']}
        bs[f'{tower}_bn'] = {
            'mean': sd[prefix + f'{tower}.1.running_mean'],
            'var': sd[prefix + f'{tower}.1.running_var']}
    return p, bs


def convert_knet_head(sd: Dict[str, np.ndarray], prefix: str = ''
                      ) -> Tuple[Dict, Dict]:
    """mmseg IterativeDecodeHead (knet_head.py: nested
    kernel_generate_head [any head layout] + kernel_update_head.{i}
    stages with mmcv MultiheadAttention / FFN / KernelUpdator Linears
    and LNs) -> advanced_heads.IterativeDecodeHead."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    gen = {k[len(prefix) + 21:]: v for k, v in sd.items()
           if k.startswith(prefix + 'kernel_generate_head.')}
    if gen:
        p['kernel_generate_head'], bs['kernel_generate_head'] = \
            convert_any_head(gen)

    def ln(key):
        return {'scale': sd[key + '.weight'], 'bias': sd[key + '.bias']}

    def lin(key, bias=True):
        out = {'kernel': sd[key + '.weight'].T}
        if bias and key + '.bias' in sd:
            out['bias'] = sd[key + '.bias']
        return out

    i = 0
    while prefix + f'kernel_update_head.{i}.fc_mask.weight' in sd:
        pre = prefix + f'kernel_update_head.{i}.'
        hp: Dict[str, Any] = {}
        hb: Dict[str, Any] = {}
        if pre + 'feat_transform.conv.weight' in sd:
            hp['feat_transform'] = _biased_conv(sd,
                                                pre + 'feat_transform.conv')
        hp['attn_qkv'] = {
            'kernel': sd[pre + 'attention.attn.in_proj_weight'].T,
            'bias': sd[pre + 'attention.attn.in_proj_bias']}
        hp['attn_out'] = lin(pre + 'attention.attn.out_proj')
        hp['attention_norm'] = ln(pre + 'attention_norm')
        ku = pre + 'kernel_update_conv.'
        kp: Dict[str, Any] = {}
        for name in ('dynamic_layer', 'input_layer', 'input_gate',
                     'update_gate', 'fc_layer'):
            kp[name] = lin(ku + name)
        for name in ('norm_in', 'norm_out', 'input_norm_in',
                     'input_norm_out', 'fc_norm', 'gate_norm'):
            if ku + name + '.weight' in sd:
                kp[name] = ln(ku + name)
        hp['kernel_update_conv'] = kp
        if pre + 'ffn.layers.0.0.weight' in sd:
            hp['ffn_fc1'] = lin(pre + 'ffn.layers.0.0')
            hp['ffn_fc2'] = lin(pre + 'ffn.layers.1')
            hp['ffn_norm'] = ln(pre + 'ffn_norm')
        j = 0
        while pre + f'mask_fcs.{j * 3}.weight' in sd:
            hp[f'mask_fc_{j}'] = lin(pre + f'mask_fcs.{j * 3}',
                                     bias=False)
            hp[f'mask_ln_{j}'] = ln(pre + f'mask_fcs.{j * 3 + 1}')
            j += 1
        hp['fc_mask'] = lin(pre + 'fc_mask')
        p[f'kernel_update_head_{i}'] = hp
        if hb:
            bs[f'kernel_update_head_{i}'] = hb
        i += 1
    return p, bs


def convert_mmseg_checkpoint(path_or_sd,
                             num_layers: int = 12,
                             dst_grid: Optional[Tuple[int, int]] = None,
                             num_aux: int = 4) -> Dict[str, Dict]:
    """Full S4Former/mmseg checkpoint -> our variables dict.

    Handles: backbone-only DeiT files, full EncoderDecoder state_dicts
    (backbone./decode_head./auxiliary_head.N.), and EMA twins
    (backbone_ema./decode_head_ema. -> ema_params)."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else \
        load_torch_state_dict(path_or_sd)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    ema_params: Dict[str, Any] = {}
    ema_bs: Dict[str, Any] = {}

    bb = sub('backbone.')
    if not bb and 'patch_embed.proj.weight' in _normalize_backbone_keys(sd):
        bb = sd  # backbone-only checkpoint with bare keys
    if not bb and any(k.startswith('layers.') or k.startswith('blocks.')
                      or k == 'cls_token' for k in sd):
        bb = sd
    def convert_backbone(bb_sd):
        if 'layers.0.0.projection.weight' in bb_sd:
            # MiT: per-stage [patch_embed, blocks, norm] triples
            return convert_mit_backbone(bb_sd)
        if 'stages.0.blocks.0.attn.w_msa.qkv.weight' in bb_sd:
            return convert_swin_backbone(bb_sd)
        if 'layers.0.gamma_1' in bb_sd:                  # BEiT/MAE
            return convert_beit_backbone(bb_sd)
        if 'patch_embeds.0.projection.weight' in bb_sd:  # Twins
            return convert_twins_backbone(bb_sd)
        if 'encoder.0.0.convs.0.conv.weight' in bb_sd:     # UNet
            return convert_unet_backbone(bb_sd)
        if 'stage2.0.branches.0.0.conv1.weight' in bb_sd:  # HRNet
            return convert_hrnet_backbone(bb_sd)           # (before ResNet:
            # HRNet checkpoints also carry layer1.0.conv1.weight)
        if 'detail.detail_branch.0.0.conv.weight' in bb_sd:  # BiSeNetV2
            return convert_bisenetv2_backbone(bb_sd)
        if 'spatial_path.layer1.conv.weight' in bb_sd:       # BiSeNetV1
            return convert_bisenetv1_backbone(bb_sd)
        if 'backbone.stages.0.conv.weight' in bb_sd:  # STDCContextPath
            return convert_stdc_context_path(bb_sd)
        if 'learning_to_downsample.conv.conv.weight' in bb_sd:  # FastSCNN
            return convert_fastscnn_backbone(bb_sd)
        if 'conv_sub1.0.conv.weight' in bb_sd:               # ICNet
            return convert_icnet_backbone(bb_sd)
        if 'norm_prelu_0.1.weight' in bb_sd:                 # CGNet
            return convert_cgnet_backbone(bb_sd)
        if 'encoder.0.conv.weight' in bb_sd:                 # ERFNet
            return convert_erfnet_backbone(bb_sd)
        if 'stages.0.conv.weight' in bb_sd:                  # bare STDCNet
            return convert_stdc_backbone(bb_sd)
        if 'layer1.0.conv.0.conv.weight' in bb_sd:       # MobileNetV2
            return convert_mobilenet_v2_backbone(bb_sd)
        if 'layer1.depthwise_conv.conv.weight' in bb_sd:  # MobileNetV3
            return convert_mobilenet_v3_backbone(bb_sd)
        if 'layer1.0.conv2.conv.weight' in bb_sd:        # ResNeSt SplAt
            return convert_resnest_backbone(bb_sd)
        if 'layer1.0.conv1.weight' in bb_sd or 'stem.0.weight' in bb_sd:
            return convert_resnet_backbone(bb_sd)
        return convert_vit_backbone(bb_sd, num_layers, dst_grid)

    if bb:
        p, b = convert_backbone(bb)
        if p:
            params['backbone_m'] = p
        if b:
            batch_stats['backbone_m'] = b

    nk = sub('neck.')
    if 'fpn_convs.0.conv.weight' in nk:          # FPN neck (has fpn_convs;
        # MultiLevelNeck also carries lateral_convs but uses 'convs')
        p, b = convert_fpn_neck(nk)
        params['neck_m'] = p
        if b:
            batch_stats['neck_m'] = b
    elif 'mla.channel_proj.0.conv.weight' in nk:  # MLA neck
        p, b = convert_mla_neck(nk)
        params['neck_m'] = p
    elif 'cff_24.conv_low.conv.weight' in nk:     # ICNeck
        p, b = convert_ic_neck(nk)
        params['neck_m'] = p
        batch_stats['neck_m'] = b
    elif 'lateral_convs.0.conv.weight' in nk:     # MultiLevelNeck
        p, b = convert_multilevel_neck(nk)
        params['neck_m'] = p
    elif 'upsample_2x.0.weight' in nk:            # Feature2Pyramid
        p, b = convert_feature2pyramid_neck(nk)
        params['neck_m'] = p
        if b:
            batch_stats['neck_m'] = b
    elif 'dilation_layers.0.0.depthwise_conv.conv.weight' in nk:  # JPU
        p, b = convert_jpu_neck(nk)
        params['neck_m'] = p
        batch_stats['neck_m'] = b

    convert_head = convert_any_head

    if any(k.startswith('decode_head.0.') for k in sd):
        # CascadeEncoderDecoder checkpoint: decode_head.{i}. stage heads
        # map onto our cascade_heads_{i} modules
        i = 0
        while True:
            dh = sub(f'decode_head.{i}.')
            if not dh:
                break
            p, b = convert_head(dh)
            params[f'cascade_heads_{i}'] = p
            batch_stats[f'cascade_heads_{i}'] = b
            i += 1
    else:
        dh = sub('decode_head.')
        if dh:
            p, b = convert_head(dh)
            params['decode_head_m'] = p
            batch_stats['decode_head_m'] = b
    aux_p, aux_b = [], []
    for i in range(num_aux):
        ah = sub(f'auxiliary_head.{i}.')
        if ah:
            p, b = convert_head(ah)
            aux_p.append(p)
            aux_b.append(b)
    if aux_p:
        # our segmentor fuses identical aux heads into one vmapped stack
        # with a leading [num_aux] axis (params['aux_heads']); also emit the
        # per-head layout for fuse_aux_heads=False models
        def stack_trees(trees):
            return jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *trees)

        params['aux_heads'] = {'head': stack_trees(aux_p)}
        batch_stats['aux_heads'] = {'head': stack_trees(aux_b)}
        for i, (p, b) in enumerate(zip(aux_p, aux_b)):
            params[f'aux_heads_{i}'] = p
            batch_stats[f'aux_heads_{i}'] = b

    bbe = sub('backbone_ema.')
    if bbe:
        p, b = convert_backbone(bbe)
        ema_params['backbone_m'] = p
        if b:
            ema_bs['backbone_m'] = b
    dhe = sub('decode_head_ema.')
    if dhe:
        p, b = convert_head(dhe)
        ema_params['decode_head_m'] = p
        ema_bs['decode_head_m'] = b

    out = {'params': params, 'batch_stats': batch_stats}
    if ema_params:
        out['ema_params'] = ema_params
        out['ema_batch_stats'] = ema_bs
    return out


def merge_pretrained(variables: Dict, pretrained: Dict,
                     strict: bool = False) -> Dict:
    """Overlay converted weights onto freshly-initialized variables,
    keeping init values for anything missing (e.g. heads when loading a
    backbone-only DeiT file). Shape mismatches raise."""
    import copy
    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables))

    def overlay(dst, src, path=''):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    if strict:
                        raise KeyError(f'unexpected subtree {path}/{k}')
                    continue
                overlay(dst[k], v, f'{path}/{k}')
            else:
                if k not in dst:
                    if strict:
                        raise KeyError(f'unexpected leaf {path}/{k}')
                    continue
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    raise ValueError(
                        f'shape mismatch at {path}/{k}: '
                        f'{np.shape(dst[k])} vs {np.shape(v)}')
                # np.array COPIES: converter outputs can be views into
                # torch storage (transposes of t.numpy()), and jnp.asarray
                # zero-copies aligned numpy on the CPU runtime — without
                # this, later in-place torch mutations would silently
                # rewrite the "loaded" jax weights
                dst[k] = np.array(v, dtype=np.asarray(dst[k]).dtype)

    for col in pretrained:
        if col in out:
            overlay(out[col], pretrained[col], col)
    return jax.tree_util.tree_map(jnp.asarray, out)


# --------------------------------------------------------------- export
# Reverse direction of convert_mmseg_checkpoint: our variables -> a
# reference-shaped torch state_dict (SURVEY.md §7 hard parts: "checkpoint
# compat BOTH directions"). Lets reference tooling (mmseg test.py, the
# paper's eval scripts) consume checkpoints trained here, and closes the
# cross-validation loop: convert(export(v)) == v (tested).

def export_vit_backbone(p: Dict) -> Dict[str, np.ndarray]:
    """Our stacked-scan ViT params subtree -> OpenMMLab-layout keys
    (without the 'backbone.' prefix). Exact inverse of
    convert_vit_backbone."""
    sd: Dict[str, np.ndarray] = {}
    if 'cls_token' in p:
        sd['cls_token'] = np.asarray(p['cls_token'])
    if 'pos_embed' in p:
        sd['pos_embed'] = np.asarray(p['pos_embed'])
    if 'patch_embed' in p:
        sd['patch_embed.projection.weight'] = np.transpose(
            np.asarray(p['patch_embed']['kernel']), (3, 2, 0, 1))
        sd['patch_embed.projection.bias'] = np.asarray(
            p['patch_embed']['bias'])
    if 'layers' in p:
        blk = p['layers']['block']
        n = np.asarray(blk['ln1']['scale']).shape[0]
        for i in range(n):
            pre = f'layers.{i}.'
            sd[pre + 'ln1.weight'] = np.asarray(blk['ln1']['scale'][i])
            sd[pre + 'ln1.bias'] = np.asarray(blk['ln1']['bias'][i])
            sd[pre + 'ln2.weight'] = np.asarray(blk['ln2']['scale'][i])
            sd[pre + 'ln2.bias'] = np.asarray(blk['ln2']['bias'][i])
            sd[pre + 'attn.attn.in_proj_weight'] = np.asarray(
                blk['attn']['qkv']['kernel'][i]).T
            sd[pre + 'attn.attn.in_proj_bias'] = np.asarray(
                blk['attn']['qkv']['bias'][i])
            sd[pre + 'attn.attn.out_proj.weight'] = np.asarray(
                blk['attn']['proj']['kernel'][i]).T
            sd[pre + 'attn.attn.out_proj.bias'] = np.asarray(
                blk['attn']['proj']['bias'][i])
            sd[pre + 'ffn.layers.0.0.weight'] = np.asarray(
                blk['ffn']['fc1']['kernel'][i]).T
            sd[pre + 'ffn.layers.0.0.bias'] = np.asarray(
                blk['ffn']['fc1']['bias'][i])
            sd[pre + 'ffn.layers.1.weight'] = np.asarray(
                blk['ffn']['fc2']['kernel'][i]).T
            sd[pre + 'ffn.layers.1.bias'] = np.asarray(
                blk['ffn']['fc2']['bias'][i])
    return sd


def export_setr_up_head(p: Dict, bs: Dict, prefix: str = ''
                        ) -> Dict[str, np.ndarray]:
    """Inverse of convert_setr_up_head."""
    sd: Dict[str, np.ndarray] = {}
    if 'norm' in p:
        sd[prefix + 'norm.weight'] = np.asarray(p['norm']['scale'])
        sd[prefix + 'norm.bias'] = np.asarray(p['norm']['bias'])
    i = 0
    while f'up_convs_{i}' in p:
        c = p[f'up_convs_{i}']
        sd[prefix + f'up_convs.{i}.0.conv.weight'] = np.transpose(
            np.asarray(c['conv']['kernel']), (3, 2, 0, 1))
        sd[prefix + f'up_convs.{i}.0.bn.weight'] = np.asarray(
            c['bn']['scale'])
        sd[prefix + f'up_convs.{i}.0.bn.bias'] = np.asarray(c['bn']['bias'])
        b = bs.get(f'up_convs_{i}', {}).get('bn', {})
        if b:
            sd[prefix + f'up_convs.{i}.0.bn.running_mean'] = np.asarray(
                b['mean'])
            sd[prefix + f'up_convs.{i}.0.bn.running_var'] = np.asarray(
                b['var'])
        i += 1
    if 'conv_seg' in p:
        sd[prefix + 'conv_seg.weight'] = np.transpose(
            np.asarray(p['conv_seg']['kernel']), (3, 2, 0, 1))
        sd[prefix + 'conv_seg.bias'] = np.asarray(p['conv_seg']['bias'])
    return sd


def export_reference_state_dict(variables: Dict,
                                path: Optional[str] = None) -> Dict:
    """Our variables (params/batch_stats[/ema_*]) -> flat reference-layout
    state_dict; saved with torch.save when ``path`` is given (loadable by
    the reference's load_checkpoint / tools/test.py)."""
    params = variables.get('params', variables)
    bs = variables.get('batch_stats', {})
    sd: Dict[str, np.ndarray] = {}
    if 'backbone_m' in params:
        for k, v in export_vit_backbone(params['backbone_m']).items():
            sd['backbone.' + k] = v
    if 'decode_head_m' in params:
        sd.update(export_setr_up_head(
            params['decode_head_m'], bs.get('decode_head_m', {}),
            'decode_head.'))
    if 'aux_heads' in params:
        stacked_p = params['aux_heads']['head']
        stacked_b = bs.get('aux_heads', {}).get('head', {})
        n = np.asarray(jax.tree_util.tree_leaves(stacked_p)[0]).shape[0]
        for j in range(n):
            pj = jax.tree_util.tree_map(lambda x: np.asarray(x)[j],
                                        stacked_p)
            bj = jax.tree_util.tree_map(lambda x: np.asarray(x)[j],
                                        stacked_b)
            sd.update(export_setr_up_head(pj, bj, f'auxiliary_head.{j}.'))
    for src, dst in (('ema_params', ''), ):
        ema = variables.get(src)
        if ema:
            ebs = variables.get('ema_batch_stats', {})
            if 'backbone_m' in ema:
                for k, v in export_vit_backbone(ema['backbone_m']).items():
                    sd['backbone_ema.' + k] = v
            if 'decode_head_m' in ema:
                sd.update(export_setr_up_head(
                    ema['decode_head_m'], ebs.get('decode_head_m', {}),
                    'decode_head_ema.'))
    if path is not None:
        import torch
        torch.save({'state_dict': {k: torch.from_numpy(
            np.ascontiguousarray(v)) for k, v in sd.items()},
            'meta': {'exported_by': 's4former_tpu'}}, path)
    return sd
