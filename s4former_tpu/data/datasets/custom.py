"""Dataset layer: split-file-driven segmentation datasets.

Rebuild of ``CustomDataset`` and friends
(reference: mmseg/datasets/custom.py:32-512, voc.py:9, cityscapes.py:14,
dataset_wrappers.py:279-330). Items are numpy dicts produced by the
pipeline (s4former_tpu.data.pipelines.transforms); batching happens in the
loader.
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np

from s4former_tpu.core.metrics import (eval_metrics, intersect_and_union,
                                       pre_eval_to_metrics)
from s4former_tpu.data.pipelines.transforms import Compose
from s4former_tpu.registry import DATASETS


@DATASETS.register_module()
class CustomDataset:
    """(custom.py:32). img_dir + ann_dir (+ optional split file listing
    stems). ``__getitem__`` runs the pipeline; ``pre_eval`` computes
    per-image confusion histograms (custom.py:302)."""

    CLASSES: Optional[Sequence[str]] = None
    PALETTE = None

    def __init__(self,
                 pipeline,
                 img_dir: str,
                 img_suffix: str = '.jpg',
                 ann_dir: Optional[str] = None,
                 seg_map_suffix: str = '.png',
                 split: Optional[str] = None,
                 data_root: Optional[str] = None,
                 test_mode: bool = False,
                 ignore_index: int = 255,
                 reduce_zero_label: bool = False,
                 classes=None,
                 palette=None,
                 seed: int = 0,
                 **kwargs):
        self.pipeline = Compose(pipeline)
        self.img_dir = img_dir
        self.img_suffix = img_suffix
        self.ann_dir = ann_dir
        self.seg_map_suffix = seg_map_suffix
        self.split = split
        self.data_root = data_root
        self.test_mode = test_mode
        self.ignore_index = ignore_index
        self.reduce_zero_label = reduce_zero_label
        self.label_map = None
        self.base_seed = seed
        if classes is not None:
            self.CLASSES = tuple(classes)
        if palette is not None:
            self.PALETTE = palette

        if data_root is not None:
            if not osp.isabs(self.img_dir):
                self.img_dir = osp.join(data_root, self.img_dir)
            if self.ann_dir is not None and not osp.isabs(self.ann_dir):
                self.ann_dir = osp.join(data_root, self.ann_dir)
            if self.split is not None and not osp.isabs(self.split):
                self.split = osp.join(data_root, self.split)

        self.img_infos = self.load_annotations()

    def load_annotations(self) -> List[Dict]:
        """(custom.py:150): split file of stems, or scan img_dir."""
        infos = []
        if self.split is not None:
            with open(self.split) as f:
                stems = [line.strip() for line in f if line.strip()]
            for stem in stems:
                info = dict(
                    filename=osp.join(self.img_dir, stem + self.img_suffix),
                    ori_filename=stem + self.img_suffix)
                if self.ann_dir is not None:
                    info['seg_map'] = osp.join(
                        self.ann_dir, stem + self.seg_map_suffix)
                infos.append(info)
        else:
            import glob
            for path in sorted(glob.glob(
                    osp.join(self.img_dir, f'*{self.img_suffix}'))):
                stem = osp.splitext(osp.basename(path))[0]
                info = dict(filename=path,
                            ori_filename=osp.basename(path))
                if self.ann_dir is not None:
                    info['seg_map'] = osp.join(
                        self.ann_dir, stem + self.seg_map_suffix)
                infos.append(info)
        return infos

    def __len__(self) -> int:
        return len(self.img_infos)

    def _base_results(self, idx: int) -> Dict:
        info = self.img_infos[idx]
        results: Dict = dict(
            img_info=dict(filename=info['filename'],
                          ori_filename=info['ori_filename']),
            seg_fields=[])
        if 'seg_map' in info:
            results['ann_info'] = dict(seg_map=info['seg_map'])
        if self.label_map is not None:
            results['label_map'] = self.label_map
        return results

    def __getitem__(self, idx: int):
        results = self._base_results(idx)
        # deterministic per-(epoch-less) sample rng; reseeded per access
        results['rng'] = np.random.default_rng(
            np.random.SeedSequence([self.base_seed, idx,
                                    np.random.randint(0, 2 ** 31)]))
        return self.pipeline(results)

    def get_item_deterministic(self, idx: int, seed: int):
        results = self._base_results(idx)
        results['rng'] = np.random.default_rng(
            np.random.SeedSequence([self.base_seed, seed, idx]))
        return self.pipeline(results)

    def get_gt_seg_map(self, idx: int) -> np.ndarray:
        from PIL import Image
        seg = np.asarray(Image.open(self.img_infos[idx]['seg_map']))
        if seg.ndim == 3:
            seg = seg[..., 0]
        seg = seg.astype(np.int32)
        if self.reduce_zero_label:
            seg[seg == 0] = 256
            seg = seg - 1
            seg[seg == 255] = 255
        if self.label_map is not None:
            out = seg.copy()
            for old_id, new_id in self.label_map.items():
                out[seg == old_id] = new_id
            seg = out
        return seg

    # --------------------------------------------------------- evaluation
    def pre_eval(self, preds, indices):
        """(custom.py:302): per-image (intersect, union, areas) tuples."""
        if not isinstance(indices, (list, tuple)):
            indices = [indices]
        if not isinstance(preds, (list, tuple)):
            preds = [preds]
        out = []
        for pred, idx in zip(preds, indices):
            gt = self.get_gt_seg_map(idx)
            out.append(tuple(np.asarray(x) for x in intersect_and_union(
                np.asarray(pred), gt, len(self.CLASSES),
                self.ignore_index)))
        return out

    def evaluate(self, results, metric='mIoU', **kwargs):
        """(custom.py:413): accepts pre_eval tuples or full seg maps."""
        metrics = [metric] if isinstance(metric, str) else list(metric)
        if len(results) and isinstance(results[0], tuple):
            tables = pre_eval_to_metrics(results, metrics)
        else:
            gts = [self.get_gt_seg_map(i) for i in range(len(self))]
            tables = eval_metrics(results, gts, len(self.CLASSES),
                                  self.ignore_index, metrics)
        out = {'aAcc': float(tables['aAcc'])}
        for key, vals in tables.items():
            if key == 'aAcc':
                continue
            out[f'm{key}'] = float(np.nanmean(vals))
            for name, v in zip(self.CLASSES or [], np.asarray(vals)):
                out[f'{key}.{name}'] = float(v)
        return out

    def format_results(self, results, imgfile_prefix, indices=None,
                       **kwargs):
        """Placeholder, dataset-specific (ref custom.py:275-277) —
        CityscapesDataset materializes labelId submission PNGs."""
        raise NotImplementedError(
            f'{type(self).__name__} defines no submission format; '
            'use a dataset with format_results (e.g. cityscapes)')


@DATASETS.register_module()
class PascalVOCDataset(CustomDataset):
    """(voc.py:9): 21 classes, palette, split required upstream."""

    CLASSES = ('background', 'aeroplane', 'bicycle', 'bird', 'boat',
               'bottle', 'bus', 'car', 'cat', 'chair', 'cow', 'diningtable',
               'dog', 'horse', 'motorbike', 'person', 'pottedplant', 'sheep',
               'sofa', 'train', 'tvmonitor')
    PALETTE = [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0],
               [0, 0, 128], [128, 0, 128], [0, 128, 128], [128, 128, 128],
               [64, 0, 0], [192, 0, 0], [64, 128, 0], [192, 128, 0],
               [64, 0, 128], [192, 0, 128], [64, 128, 128], [192, 128, 128],
               [0, 64, 0], [128, 64, 0], [0, 192, 0], [128, 192, 0],
               [0, 64, 128]]

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '.png')
        super().__init__(**kwargs)


@DATASETS.register_module()
class CityscapesDataset(CustomDataset):
    """(cityscapes.py:14): trainId label maps (*_gtFine_labelTrainIds)."""

    CLASSES = ('road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
               'traffic light', 'traffic sign', 'vegetation', 'terrain',
               'sky', 'person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle')
    PALETTE = [[128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
               [190, 153, 153], [153, 153, 153], [250, 170, 30],
               [220, 220, 0], [107, 142, 35], [152, 251, 152],
               [70, 130, 180], [220, 20, 60], [255, 0, 0], [0, 0, 142],
               [0, 0, 70], [0, 60, 100], [0, 80, 100], [0, 0, 230],
               [119, 11, 32]]

    # trainId -> labelId (cityscapesscripts.helpers.labels); hardcoded so
    # format_results works without the optional dependency
    TRAINID2LABELID = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25,
                       26, 27, 28, 31, 32, 33)

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '_leftImg8bit.png')
        kwargs.setdefault('seg_map_suffix', '_gtFine_labelTrainIds.png')
        super().__init__(**kwargs)

    def _convert_to_label_id(self, result):
        """trainId map -> labelId map for server submission
        (ref cityscapes.py:36-47)."""
        import numpy as np
        out = np.full_like(result, 0)
        for train_id, label_id in enumerate(self.TRAINID2LABELID):
            out[result == train_id] = label_id
        return out

    def results2img(self, results, imgfile_prefix, to_label_id=True,
                    indices=None):
        """Write predictions as paletted PNGs in the official layout
        (ref cityscapes.py:49-93). Uses cityscapesscripts' palette when
        installed, the trainId palette otherwise."""
        import os
        import os.path as osp
        import numpy as np
        from PIL import Image
        if indices is None:
            indices = list(range(len(self)))
        os.makedirs(imgfile_prefix, exist_ok=True)
        try:
            import cityscapesscripts.helpers.labels as CSLabels
            palette = np.zeros((len(CSLabels.id2label), 3), np.uint8)
            for label_id, label in CSLabels.id2label.items():
                palette[label_id] = label.color
        except ImportError:
            palette = np.zeros((max(self.TRAINID2LABELID) + 1, 3), np.uint8)
            for tid, lid in enumerate(self.TRAINID2LABELID):
                palette[lid] = self.PALETTE[tid]
        files = []
        for result, idx in zip(results, indices):
            if to_label_id:
                result = self._convert_to_label_id(np.asarray(result))
            base = osp.splitext(osp.basename(
                self.img_infos[idx]['filename']))[0]
            png = osp.join(imgfile_prefix, f'{base}.png')
            out = Image.fromarray(result.astype(np.uint8)).convert('P')
            out.putpalette(palette.reshape(-1).tolist())
            out.save(png)
            files.append(png)
        return files

    def format_results(self, results, imgfile_prefix, to_label_id=True,
                       indices=None):
        """(ref cityscapes.py:95-128): materialize submission PNGs."""
        return self.results2img(results, imgfile_prefix, to_label_id,
                                indices)

    def evaluate(self, results, metric='mIoU', logger=None,
                 imgfile_prefix=None, **kwargs):
        """'cityscapes' metric routes to the official cityscapesscripts
        evaluator when installed (ref cityscapes.py:130-169); other
        metrics use the built-in histogram mIoU."""
        metrics = list(metric) if isinstance(metric, (list, tuple)) \
            else [metric]
        out = {}
        if 'cityscapes' in metrics:
            out.update(self._evaluate_cityscapes(results, imgfile_prefix))
            metrics.remove('cityscapes')
        if metrics:
            out.update(super().evaluate(results, metrics, logger=logger,
                                        **kwargs))
        return out

    def _evaluate_cityscapes(self, results, imgfile_prefix):
        import os.path as osp
        try:
            import cityscapesscripts.evaluation. \
                evalPixelLevelSemanticLabeling as CSEval
        except ImportError as e:
            raise ImportError(
                'the "cityscapes" metric needs cityscapesscripts '
                '(pip install cityscapesscripts)') from e
        result_dir = imgfile_prefix or 'cityscapes_eval_tmp'
        self.format_results(results, result_dir)
        CSEval.args.evalInstLevelScore = True
        CSEval.args.predictionPath = osp.abspath(result_dir)
        CSEval.args.evalPixelAccuracy = True
        CSEval.args.JSONOutput = False
        seg_maps, preds = [], []
        import glob
        for seg_map in sorted(glob.glob(osp.join(
                self.ann_dir, '**', '*gtFine_labelIds.png'),
                recursive=True)):
            seg_maps.append(seg_map)
            preds.append(CSEval.getPrediction(CSEval.args, seg_map))
        return dict(CSEval.evaluateImgLists(preds, seg_maps, CSEval.args))


@DATASETS.register_module()
class ADE20KDataset(CustomDataset):
    """(ade.py): 150 classes, reduce_zero_label. Full class/palette tables
    from core.class_names (ref class_names.py:15-43,152-193)."""

    from s4former_tpu.core.class_names import ade_classes, ade_palette
    CLASSES = tuple(ade_classes())
    PALETTE = ade_palette()

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


@DATASETS.register_module()
class SemiDataset:
    """(dataset_wrappers.py:279-305): a (sup, unsup) dataset pair. Unlike
    the reference's flat ConcatDataset + flattening collate, we keep the
    two sources explicit — the sampler draws fixed ratios from each."""

    def __init__(self, sup: dict, unsup: dict, **kwargs):
        self.sup = DATASETS.build(dict(sup)) if isinstance(sup, dict) \
            else sup
        self.unsup = DATASETS.build(dict(unsup)) if isinstance(unsup, dict) \
            else unsup
        self.CLASSES = self.sup.CLASSES
        self.PALETTE = self.sup.PALETTE

    def __len__(self):
        return len(self.sup) + len(self.unsup)


@DATASETS.register_module()
class RepeatDataset:
    """(dataset_wrappers.py:165-192): length = times * len(dataset),
    items repeat modulo — cuts epoch-boundary overhead for small sets."""

    def __init__(self, dataset, times: int):
        self.dataset = DATASETS.build(dict(dataset)) \
            if isinstance(dataset, dict) else dataset
        self.times = int(times)
        self.CLASSES = self.dataset.CLASSES
        self.PALETTE = self.dataset.PALETTE
        self._ori_len = len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def get_gt_seg_map(self, idx):
        return self.dataset.get_gt_seg_map(idx % self._ori_len)

    def pre_eval(self, preds, indices):
        if not isinstance(indices, (list, tuple)):
            indices = [indices]
        return self.dataset.pre_eval(preds,
                                     [i % self._ori_len for i in indices])

    def evaluate(self, results, **kwargs):
        return self.dataset.evaluate(results, **kwargs)

    def __len__(self):
        return self.times * self._ori_len


@DATASETS.register_module()
class ConcatDataset:
    """(dataset_wrappers.py:16-163): concatenation with per-source or
    merged evaluation. separate_eval=True prefixes each source's metric
    keys with its index."""

    def __init__(self, datasets, separate_eval: bool = True):
        self.datasets = [DATASETS.build(dict(d)) if isinstance(d, dict)
                         else d for d in datasets]
        assert self.datasets, 'ConcatDataset needs at least one dataset'
        sizes = [len(d) for d in self.datasets]
        self.cumulative_sizes = list(np.cumsum(sizes))
        self.CLASSES = self.datasets[0].CLASSES
        self.PALETTE = self.datasets[0].PALETTE
        self.separate_eval = bool(separate_eval)

    def _locate(self, idx):
        import bisect
        d = bisect.bisect_right(self.cumulative_sizes, idx)
        off = idx - (self.cumulative_sizes[d - 1] if d else 0)
        return d, off

    def __getitem__(self, idx):
        d, off = self._locate(idx)
        return self.datasets[d][off]

    def get_gt_seg_map(self, idx):
        d, off = self._locate(idx)
        return self.datasets[d].get_gt_seg_map(off)

    def pre_eval(self, preds, indices):
        if not isinstance(indices, (list, tuple)):
            indices = [indices]
            preds = [preds]
        out = []
        for pred, idx in zip(preds, indices):
            d, off = self._locate(idx)
            out.extend(self.datasets[d].pre_eval([pred], [off]))
        return out

    def evaluate(self, results, **kwargs):
        assert len(results) == self.cumulative_sizes[-1], (
            f'results size {len(results)} != dataset size '
            f'{self.cumulative_sizes[-1]}')
        if not self.separate_eval:
            assert all(d.CLASSES == self.CLASSES for d in self.datasets), \
                'merged eval needs identical CLASSES across sources'
            # merged eval over ONE histogram (chunk-wise averaging would
            # be wrong): pre_eval tuples go straight to the shared
            # pre_eval_to_metrics path; full seg maps pair with gathered
            # gts across all sources
            if results and isinstance(results[0], tuple):
                return self.datasets[0].evaluate(results, **kwargs)
            gts = [self.get_gt_seg_map(i) for i in range(len(self))]
            from s4former_tpu.core.metrics import eval_metrics
            metric = kwargs.get('metric', 'mIoU')
            metrics = [metric] if isinstance(metric, str) else list(metric)
            t = eval_metrics(results, gts, len(self.CLASSES),
                             self.datasets[0].ignore_index, metrics)
            out = {'aAcc': float(t['aAcc'])}
            for key, vals in t.items():
                if key != 'aAcc':
                    out[f'm{key}'] = float(np.nanmean(vals))
            return out
        out = {}
        start = 0
        for i, (d, end) in enumerate(zip(self.datasets,
                                         self.cumulative_sizes)):
            res = d.evaluate(results[start:end], **kwargs)
            out.update({f'{i}_{k}': v for k, v in res.items()})
            start = end
        return out

    def __len__(self):
        return self.cumulative_sizes[-1]


@DATASETS.register_module(name='ConcatDataset_SETR')
class ConcatDatasetSETR(ConcatDataset):
    """(dataset_wrappers.py:279-291): plain concatenation (the group-flag
    concat is aspect-ratio batching machinery our loader doesn't need)."""

    def __init__(self, datasets):
        super().__init__(datasets, separate_eval=True)


def build_dataset(cfg: dict):
    return DATASETS.build(dict(cfg))


@DATASETS.register_module()
class COCOStuffDataset(CustomDataset):
    """(coco_stuff.py): 171 classes (full tables,
    ref class_names.py:55-89,222-267)."""
    from s4former_tpu.core.class_names import (cocostuff_classes,
                                               cocostuff_palette)
    CLASSES = tuple(cocostuff_classes())
    PALETTE = cocostuff_palette()

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '_labelTrainIds.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


@DATASETS.register_module()
class LoveDADataset(CustomDataset):
    """(loveda.py): 7 classes, reduce_zero_label."""
    CLASSES = ('background', 'building', 'road', 'water', 'barren',
               'forest', 'agricultural')
    PALETTE = [[255, 255, 255], [255, 0, 0], [255, 255, 0], [0, 0, 255],
               [159, 129, 183], [0, 255, 0], [255, 195, 128]]

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


@DATASETS.register_module()
class COCODataset(CustomDataset):
    """(coco.py:7): 81 COCO thing classes incl. void; .jpg images,
    .png labels."""
    from s4former_tpu.core.class_names import coco_classes, coco_palette
    CLASSES = tuple(coco_classes())
    PALETTE = coco_palette()

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '.png')
        super().__init__(**kwargs)


@DATASETS.register_module()
class PotsdamDataset(CustomDataset):
    """(potsdam.py): ISPRS Potsdam, 6 classes."""
    CLASSES = ('impervious_surface', 'building', 'low_vegetation', 'tree',
               'car', 'clutter')
    PALETTE = [[255, 255, 255], [0, 0, 255], [0, 255, 255], [0, 255, 0],
               [255, 255, 0], [255, 0, 0]]

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


@DATASETS.register_module()
class UniSemiDataset(SemiDataset):
    """(dataset_wrappers.py:308): 3-way semi wrapper — an extra unlabeled
    source (e.g. a mix-stream for UniMatch)."""

    def __init__(self, sup: dict, unsup: dict, unsup2: Optional[dict] = None,
                 **kwargs):
        super().__init__(sup, unsup, **kwargs)
        self.unsup2 = DATASETS.build(dict(unsup2)) if unsup2 else None

    def __len__(self):
        n = super().__len__()
        return n + (len(self.unsup2) if self.unsup2 else 0)


@DATASETS.register_module()
class MultiImageMixDataset:
    """(dataset_wrappers.py:195-277): wrapper running a pipeline where
    transforms exposing ``get_indexes`` (e.g. RandomMosaic) receive extra
    dataset items as ``results['mix_results']``."""

    def __init__(self, dataset, pipeline, skip_type_keys=None):
        import copy as _copy
        from s4former_tpu.registry import PIPELINES
        self._copy = _copy
        self.dataset = DATASETS.build(dict(dataset)) \
            if isinstance(dataset, dict) else dataset
        self._skip_type_keys = skip_type_keys
        self.pipeline = []
        self.pipeline_types = []
        for t in pipeline:
            self.pipeline_types.append(t['type'])
            self.pipeline.append(PIPELINES.build(dict(t)))
        self.CLASSES = self.dataset.CLASSES
        self.PALETTE = getattr(self.dataset, 'PALETTE', None)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        results = self._copy.deepcopy(self.dataset[idx])
        for transform, ttype in zip(self.pipeline, self.pipeline_types):
            if self._skip_type_keys and ttype in self._skip_type_keys:
                continue
            if hasattr(transform, 'get_indexes'):
                indexes = transform.get_indexes(self.dataset)
                results['mix_results'] = [
                    self._copy.deepcopy(self.dataset[i]) for i in indexes]
            results = transform(results)
            results.pop('mix_results', None)
        return results


@DATASETS.register_module()
class ISPRSDataset(CustomDataset):
    """(isprs.py / vaihingen): same 6 classes as Potsdam."""
    CLASSES = PotsdamDataset.CLASSES
    PALETTE = PotsdamDataset.PALETTE

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


@DATASETS.register_module()
class iSAIDDataset(CustomDataset):
    """(isaid.py): 16 classes aerial instance-seg-as-semantic."""
    CLASSES = ('background', 'ship', 'storage_tank', 'baseball_diamond',
               'tennis_court', 'basketball_court', 'ground_track_field',
               'bridge', 'large_vehicle', 'small_vehicle', 'helicopter',
               'swimming_pool', 'roundabout', 'soccer_ball_field', 'plane',
               'harbor')

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', '_instance_color_RGB.png')
        super().__init__(**kwargs)


@DATASETS.register_module()
class PascalContextDataset(CustomDataset):
    """(pascal_context.py): 60 classes incl. background; requires a split
    file like VOC."""
    CLASSES = ('background', 'aeroplane', 'bag', 'bed', 'bedclothes', 'bench',
        'bicycle', 'bird', 'boat', 'book', 'bottle', 'building', 'bus',
        'cabinet', 'car', 'cat', 'ceiling', 'chair', 'cloth',
        'computer', 'cow', 'cup', 'curtain', 'dog', 'door', 'fence',
        'floor', 'flower', 'food', 'grass', 'ground', 'horse',
        'keyboard', 'light', 'motorbike', 'mountain', 'mouse',
        'person', 'plate', 'platform', 'pottedplant', 'road', 'rock',
        'sheep', 'shelves', 'sidewalk', 'sign', 'sky', 'snow', 'sofa',
        'table', 'track', 'train', 'tree', 'truck', 'tvmonitor',
        'wall', 'water', 'window', 'wood')
    PALETTE = [[120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50],
        [4, 200, 3], [120, 120, 80], [140, 140, 140], [204, 5, 255],
        [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
        [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
        [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
        [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
        [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220],
        [255, 9, 92], [112, 9, 255], [8, 255, 214], [7, 255, 224],
        [255, 184, 6], [10, 255, 71], [255, 41, 10], [7, 255, 255],
        [224, 255, 8], [102, 8, 255], [255, 61, 6], [255, 194, 7],
        [255, 122, 8], [0, 255, 20], [255, 8, 41], [255, 5, 153],
        [6, 51, 255], [235, 12, 255], [160, 150, 20], [0, 163, 255],
        [140, 140, 140], [250, 10, 15], [20, 255, 0], [31, 255, 0],
        [255, 31, 0], [255, 224, 0], [153, 255, 0], [0, 0, 255],
        [255, 71, 0], [0, 235, 255], [0, 173, 255], [31, 0, 255]]

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', False)
        super().__init__(**kwargs)


@DATASETS.register_module()
class PascalContextDataset59(CustomDataset):
    """(pascal_context.py): 59-class variant (background dropped,
    reduce_zero_label=True)."""
    CLASSES = ('aeroplane', 'bag', 'bed', 'bedclothes', 'bench', 'bicycle',
        'bird', 'boat', 'book', 'bottle', 'building', 'bus', 'cabinet',
        'car', 'cat', 'ceiling', 'chair', 'cloth', 'computer', 'cow',
        'cup', 'curtain', 'dog', 'door', 'fence', 'floor', 'flower',
        'food', 'grass', 'ground', 'horse', 'keyboard', 'light',
        'motorbike', 'mountain', 'mouse', 'person', 'plate',
        'platform', 'pottedplant', 'road', 'rock', 'sheep', 'shelves',
        'sidewalk', 'sign', 'sky', 'snow', 'sofa', 'table', 'track',
        'train', 'tree', 'truck', 'tvmonitor', 'wall', 'water',
        'window', 'wood')
    PALETTE = [[180, 120, 120], [6, 230, 230], [80, 50, 50], [4, 200, 3],
        [120, 120, 80], [140, 140, 140], [204, 5, 255],
        [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
        [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
        [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
        [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
        [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220],
        [255, 9, 92], [112, 9, 255], [8, 255, 214], [7, 255, 224],
        [255, 184, 6], [10, 255, 71], [255, 41, 10], [7, 255, 255],
        [224, 255, 8], [102, 8, 255], [255, 61, 6], [255, 194, 7],
        [255, 122, 8], [0, 255, 20], [255, 8, 41], [255, 5, 153],
        [6, 51, 255], [235, 12, 255], [160, 150, 20], [0, 163, 255],
        [140, 140, 140], [250, 10, 15], [20, 255, 0], [31, 255, 0],
        [255, 31, 0], [255, 224, 0], [153, 255, 0], [0, 0, 255],
        [255, 71, 0], [0, 235, 255], [0, 173, 255], [31, 0, 255]]

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.jpg')
        kwargs.setdefault('seg_map_suffix', '.png')
        kwargs.setdefault('reduce_zero_label', True)
        super().__init__(**kwargs)


class _RetinalDataset(CustomDataset):
    """Shared base for the retinal vessel datasets (chase_db1.py,
    drive.py, hrf.py, stare.py): 2 classes, per-dataset suffixes."""
    CLASSES = ('background', 'vessel')
    PALETTE = [[120, 120, 120], [6, 230, 230]]
    SEG_SUFFIX = '.png'

    def __init__(self, **kwargs):
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', self.SEG_SUFFIX)
        kwargs.setdefault('reduce_zero_label', False)
        super().__init__(**kwargs)


@DATASETS.register_module()
class ChaseDB1Dataset(_RetinalDataset):
    SEG_SUFFIX = '_1stHO.png'


@DATASETS.register_module()
class DRIVEDataset(_RetinalDataset):
    SEG_SUFFIX = '_manual1.png'


@DATASETS.register_module()
class HRFDataset(_RetinalDataset):
    SEG_SUFFIX = '.png'


@DATASETS.register_module()
class STAREDataset(_RetinalDataset):
    SEG_SUFFIX = '.ah.png'


@DATASETS.register_module()
class DarkZurichDataset(CityscapesDataset):
    """(dark_zurich.py): Cityscapes classes, Dark Zurich suffixes."""

    def __init__(self, **kwargs):
        kwargs['img_suffix'] = '_rgb_anon.png'
        kwargs['seg_map_suffix'] = '_gt_labelTrainIds.png'
        super().__init__(**kwargs)


@DATASETS.register_module()
class NightDrivingDataset(CityscapesDataset):
    """(night_driving.py): Cityscapes classes, NighttimeDriving
    suffixes."""

    def __init__(self, **kwargs):
        kwargs['img_suffix'] = '_leftImg8bit.png'
        kwargs['seg_map_suffix'] = '_gtCoarse_labelTrainIds.png'
        super().__init__(**kwargs)
