from s4former_tpu.models.decode_heads.setr_up import SETRUPHead  # noqa: F401
from s4former_tpu.models.decode_heads.segformer import SegformerHead  # noqa: F401
from s4former_tpu.models.decode_heads.misc_heads import (  # noqa: F401
    FCNHead, PSPHead, SETRMLAHead)
from s4former_tpu.models.decode_heads.projection import ProjectionHead, ViTClsHead  # noqa: F401
from s4former_tpu.models.decode_heads.misc_heads import UPerHead  # noqa: F401
from s4former_tpu.models.decode_heads.misc_heads import OCRHead  # noqa: F401
from s4former_tpu.models.decode_heads.zoo_heads import (  # noqa: F401
    ANNHead, APCHead, ASPPHead, DAHead, DepthwiseSeparableASPPHead,
    DepthwiseSeparableFCNHead, DMHead, DNLHead, EMAHead, EncHead, GCHead,
    ISAHead, LRASPPHead, NLHead, PSAHead)
from s4former_tpu.models.decode_heads.advanced_heads import (  # noqa: F401
    DAFormerHead, DPTHead, IterativeDecodeHead, PointHead)
from s4former_tpu.models.decode_heads.extra_heads import (  # noqa: F401
    CCHead, FPNHead, SegmenterMaskTransformerHead, STDCHead,
    stdc_boundary_targets)
