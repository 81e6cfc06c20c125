"""High-level API layer.

Rebuild of ``mmseg/apis`` (reference: mmseg/apis/{train,test,inference}.py):
- ``init_segmentor`` (inference.py:12): config (+checkpoint) -> ready model.
- ``inference_segmentor`` (inference.py:70): image path/array -> seg map.
- ``inference_segmentor_with_attn`` (inference.py:102
  ``inference_segmentor_dist``): also returns logits + per-layer attention
  maps — via the explicit ``return_attn`` debug path instead of the
  reference's patched-mmcv ``.self_attn`` side channel.
- ``single_device_test`` (test.py:34 single_gpu_test): streaming eval over
  a dataset, pre_eval histograms.
- ``train_segmentor`` (train.py:70): assembled in tools/train.py; the
  pieces live in core.runner / semi.train_step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Segmentor:
    """A built model + variables + config, ready for inference."""

    def __init__(self, model, variables, cfg):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.num_classes = model.num_classes
        test_cfg = (cfg.get('model', {}).get('test_cfg') or {}) \
            if cfg is not None else {}
        self.mode = test_cfg.get('mode', 'whole')
        default_crop = tuple(cfg.get('crop_size', (512, 512))) \
            if cfg is not None else (512, 512)
        self.crop_size = tuple(test_cfg.get('crop_size', default_crop))
        self.stride = tuple(test_cfg.get('stride', (341, 341)))
        self._predict = None

    def apply_fn(self, img: Array) -> Array:
        return self.model.apply(self.variables, img, train=False)

    def predict(self, img: Array) -> Array:
        from s4former_tpu.models.segmentors.inference import inference
        if self._predict is None:
            model = self.model

            @jax.jit
            def _p(variables, x):
                # variables as jit ARGUMENT (closure constants embed the
                # full weight tensors into the HLO payload)
                probs = inference(
                    lambda im: model.apply(variables, im, train=False),
                    x, self.num_classes, mode=self.mode,
                    crop_size=self.crop_size, stride=self.stride)
                return jnp.argmax(probs, axis=-1).astype(jnp.int32)
            self._predict = _p
        return self._predict(self.variables, img)


def init_segmentor(config, checkpoint: Optional[str] = None,
                   seed: int = 0) -> Segmentor:
    """(reference inference.py:12)."""
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.core import checkpoint as ckpt_lib
    from s4former_tpu.models import build_segmentor, init_segmentor_variables

    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_segmentor(config.model)
    crop = tuple(config.get('crop_size', (512, 512)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(seed), (1, crop[0], crop[1], 3))
    if checkpoint:
        if checkpoint.endswith(('.pth', '.pt')):
            bb = config.model.get('backbone', {})
            pre = ckpt_lib.convert_mmseg_checkpoint(
                checkpoint, num_layers=bb.get('num_layers', 12),
                dst_grid=(crop[0] // bb.get('patch_size', 16),
                          crop[1] // bb.get('patch_size', 16)))
            variables = ckpt_lib.merge_pretrained(variables, pre)
        else:
            variables = ckpt_lib.load_inference_variables(checkpoint)
    return Segmentor(model, variables, config)


def _prepare_image(segmentor: Segmentor, img) -> Tuple[np.ndarray,
                                                       Tuple[int, int]]:
    if isinstance(img, str):
        from PIL import Image
        img = np.asarray(Image.open(img).convert('RGB'))
    img = np.asarray(img).astype(np.float32)
    norm = segmentor.cfg.get('img_norm_cfg', dict(
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])) \
        if segmentor.cfg is not None else dict(
            mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
    x = (img - np.asarray(norm['mean'], np.float32)) / \
        np.asarray(norm['std'], np.float32)
    h, w = x.shape[:2]
    ch, cw = segmentor.crop_size
    ph, pw = max(ch, h), max(cw, w)
    x = np.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
    return x[None], (h, w)


def inference_segmentor(segmentor: Segmentor, img) -> np.ndarray:
    """(reference inference.py:70): path or HWC array -> [H, W] seg map."""
    x, (h, w) = _prepare_image(segmentor, img)
    seg = np.asarray(segmentor.predict(jnp.asarray(x)))[0]
    return seg[:h, :w]


def inference_segmentor_with_attn(segmentor: Segmentor, img):
    """(reference inference.py:102 inference_segmentor_dist): returns
    (seg_map, logits, attention maps at out_indices)."""
    x, (h, w) = _prepare_image(segmentor, img)
    feats, (attns, hw) = segmentor.model.apply(
        segmentor.variables, method='extract_feat',
        img=jnp.asarray(x), return_attn=True)
    logits = segmentor.model.apply(
        segmentor.variables, method='decode_logits', feats=feats)
    if logits.shape[1:3] != x.shape[1:3]:
        from s4former_tpu.ops.resize import resize_bilinear
        logits = resize_bilinear(logits, x.shape[1:3], False)
    seg = np.asarray(jnp.argmax(logits, -1))[0][:h, :w]
    return seg, np.asarray(logits)[:, :h, :w], \
        [np.asarray(a) for a in attns]


def inference_with_teacher_pasa(segmentor: Segmentor, img,
                                ema_variables,
                                attn_mask_weight: float = 5.0,
                                patch_size: int = 16) -> np.ndarray:
    """Test-time PASA (reference encode_decode, encoder_decoder.py:265-296):
    the EMA teacher's CONTINUOUS max-softmax confidence builds the additive
    attention bias for the student's forward — used by the
    distillation/visualization path."""
    from s4former_tpu.semi.pasa import build_pasa_bias
    x, (h, w) = _prepare_image(segmentor, img)
    x = jnp.asarray(x)
    t_logits = segmentor.model.apply(
        ema_variables, method='forward_decode_from_img', img=x, train=False)
    max_prob = jnp.max(jax.nn.softmax(t_logits.astype(jnp.float32), -1), -1)
    bsz, hh, ww = max_prob.shape
    # pool the confidence map to the backbone token grid (head output may
    # differ from input resolution)
    grid_h = x.shape[1] // patch_size
    pool = max(hh // grid_h, 1)
    unconf = jnp.mean(
        (1.0 - max_prob).reshape(bsz, hh // pool, pool,
                                 ww // pool, pool),
        axis=(2, 4)).reshape(bsz, -1)
    bias = build_pasa_bias(unconf, attn_mask_weight, adaptive=True)
    logits = segmentor.model.apply(
        segmentor.variables, method='forward_decode_from_img', img=x,
        train=False, attn_bias=bias)
    if logits.shape[1:3] != x.shape[1:3]:
        from s4former_tpu.ops.resize import resize_bilinear
        logits = resize_bilinear(logits, x.shape[1:3], False)
    return np.asarray(jnp.argmax(logits, -1))[0][:h, :w]


def inference_segmentor_tta(segmentor: Segmentor, img,
                            ratios=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
                            flip: bool = True) -> np.ndarray:
    """Multi-scale + flip TTA (reference aug_test,
    encoder_decoder.py:1253-1271 + MultiScaleFlipAug): average softmax over
    rescaled inputs at the original resolution."""
    from PIL import Image
    from s4former_tpu.models.segmentors.inference import inference
    if isinstance(img, str):
        img = np.asarray(Image.open(img).convert('RGB'))
    h, w = img.shape[:2]
    total = None
    for r in ratios:
        scaled = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
            (max(1, int(w * r)), max(1, int(h * r))), Image.BILINEAR))
        x, (sh, sw) = _prepare_image(segmentor, scaled)
        probs = inference(segmentor.apply_fn, jnp.asarray(x),
                          segmentor.num_classes, mode=segmentor.mode,
                          crop_size=segmentor.crop_size,
                          stride=segmentor.stride, flip=flip)
        probs = np.asarray(probs)[0][:sh, :sw]
        from s4former_tpu.ops.resize import resize_bilinear
        probs = np.asarray(resize_bilinear(
            jnp.asarray(probs)[None], (h, w), False))[0]
        total = probs if total is None else total + probs
    return np.argmax(total, axis=-1).astype(np.int32)


def single_device_test(segmentor: Segmentor, dataset,
                       pre_eval: bool = True, progress_every: int = 50,
                       logger=None):
    """(reference test.py:34 single_gpu_test, pre_eval mode)."""
    results = []
    for idx in range(len(dataset)):
        item = dataset.get_item_deterministic(idx, seed=0)
        if isinstance(item, list):
            item = item[0]
        img = np.asarray(item['img'], np.float32)[None]
        pred = np.asarray(segmentor.predict(jnp.asarray(img)))[0]
        gt = dataset.get_gt_seg_map(idx)
        if pred.shape != gt.shape:
            from PIL import Image
            pred = np.asarray(Image.fromarray(pred.astype(np.uint8)).resize(
                (gt.shape[1], gt.shape[0]), Image.NEAREST))
        results.extend(dataset.pre_eval([pred], [idx]) if pre_eval
                       else [pred])
        if logger and (idx + 1) % progress_every == 0:
            logger.info(f'{idx + 1}/{len(dataset)}')
    return results


def show_result_pyplot(segmentor: Segmentor, img, seg: np.ndarray,
                       palette=None, opacity: float = 0.5,
                       out_file: Optional[str] = None):
    """(reference inference.py:134): palette overlay, saved or returned."""
    from s4former_tpu.utils.palette import paint_result
    from s4former_tpu.data.datasets.custom import PascalVOCDataset
    palette = palette or PascalVOCDataset.PALETTE
    out = paint_result(img, seg, palette, opacity)
    if out_file:
        from PIL import Image
        Image.fromarray(out).save(out_file)
    return out
