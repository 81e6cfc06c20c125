"""s4former_tpu: TPU-native (JAX/XLA/Pallas) semi-supervised semantic
segmentation framework with the capabilities of S4Former (CVPR 2024).

Rebuilt from scratch against the reference at JoyHuYY1412/S4Former; see
SURVEY.md for the blueprint and per-file reference citations in docstrings.
"""
__version__ = '0.1.0'

from s4former_tpu.config import Config, ConfigDict, DictAction  # noqa: F401
from s4former_tpu.registry import (BACKBONES, DATASETS, HEADS, LOSSES,  # noqa: F401
                                   MODELS, PIPELINES, SAMPLERS, SEGMENTORS)

from s4former_tpu.utils.env import (apply_platform_override as _apo,
                                    setup_compilation_cache as _scc)
_apo()
_scc()
del _apo, _scc
