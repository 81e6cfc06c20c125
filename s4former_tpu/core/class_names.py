"""Class name / palette tables (reference: mmseg/core/evaluation/
class_names.py:432 LoC). The datasets used by S4Former plus the common
zoo entries; ``get_classes``/``get_palette`` mirror the reference API.
"""
from __future__ import annotations

from typing import List, Sequence


def voc_classes() -> List[str]:
    return ['background', 'aeroplane', 'bicycle', 'bird', 'boat', 'bottle',
            'bus', 'car', 'cat', 'chair', 'cow', 'diningtable', 'dog',
            'horse', 'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
            'train', 'tvmonitor']


def voc_palette() -> List[List[int]]:
    return [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0],
            [0, 0, 128], [128, 0, 128], [0, 128, 128], [128, 128, 128],
            [64, 0, 0], [192, 0, 0], [64, 128, 0], [192, 128, 0],
            [64, 0, 128], [192, 0, 128], [64, 128, 128], [192, 128, 128],
            [0, 64, 0], [128, 64, 0], [0, 192, 0], [128, 192, 0],
            [0, 64, 128]]


def cityscapes_classes() -> List[str]:
    return ['road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
            'traffic light', 'traffic sign', 'vegetation', 'terrain',
            'sky', 'person', 'rider', 'car', 'truck', 'bus', 'train',
            'motorcycle', 'bicycle']


def cityscapes_palette() -> List[List[int]]:
    return [[128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
            [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
            [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
            [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
            [0, 80, 100], [0, 0, 230], [119, 11, 32]]


def ade_classes() -> List[str]:
    return ['wall', 'building', 'sky', 'floor', 'tree', 'ceiling', 'road',
            'bed', 'windowpane', 'grass', 'cabinet', 'sidewalk', 'person',
            'earth', 'door', 'table', 'mountain', 'plant', 'curtain',
            'chair', 'car', 'water', 'painting', 'sofa', 'shelf', 'house',
            'sea', 'mirror', 'rug', 'field', 'armchair', 'seat', 'fence',
            'desk', 'rock', 'wardrobe', 'lamp', 'bathtub', 'railing',
            'cushion', 'base', 'box', 'column', 'signboard',
            'chest of drawers', 'counter', 'sand', 'sink', 'skyscraper',
            'fireplace', 'refrigerator', 'grandstand', 'path', 'stairs',
            'runway', 'case', 'pool table', 'pillow', 'screen door',
            'stairway', 'river', 'bridge', 'bookcase', 'blind',
            'coffee table', 'toilet', 'flower', 'book', 'hill', 'bench',
            'countertop', 'stove', 'palm', 'kitchen island', 'computer',
            'swivel chair', 'boat', 'bar', 'arcade machine', 'hovel',
            'bus', 'towel', 'light', 'truck', 'tower', 'chandelier',
            'awning', 'streetlight', 'booth', 'television receiver',
            'airplane', 'dirt track', 'apparel', 'pole', 'land',
            'bannister', 'escalator', 'ottoman', 'bottle', 'buffet',
            'poster', 'stage', 'van', 'ship', 'fountain', 'conveyer belt',
            'canopy', 'washer', 'plaything', 'swimming pool', 'stool',
            'barrel', 'basket', 'waterfall', 'tent', 'bag', 'minibike',
            'cradle', 'oven', 'ball', 'food', 'step', 'tank', 'trade name',
            'microwave', 'pot', 'animal', 'bicycle', 'lake', 'dishwasher',
            'screen', 'blanket', 'sculpture', 'hood', 'sconce', 'vase',
            'traffic light', 'tray', 'ashcan', 'fan', 'pier', 'crt screen',
            'plate', 'monitor', 'bulletin board', 'shower', 'radiator',
            'glass', 'clock', 'flag']


_REGISTRY = {
    'voc': (voc_classes, voc_palette),
    'pascal_voc': (voc_classes, voc_palette),
    'cityscapes': (cityscapes_classes, cityscapes_palette),
    'ade': (ade_classes, None),
    'ade20k': (ade_classes, None),
}


def get_classes(dataset: str) -> List[str]:
    key = dataset.lower()
    if key not in _REGISTRY:
        raise KeyError(f'unknown dataset {dataset}; '
                       f'known: {sorted(_REGISTRY)}')
    return _REGISTRY[key][0]()


def get_palette(dataset: str) -> Sequence[Sequence[int]]:
    key = dataset.lower()
    fn = _REGISTRY.get(key, (None, None))[1]
    if fn is None:
        # deterministic pseudo-palette like the reference's ADE fallback
        import numpy as np
        rng = np.random.RandomState(42)
        return rng.randint(0, 255, (len(get_classes(dataset)), 3)).tolist()
    return fn()
