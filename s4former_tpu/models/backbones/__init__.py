from s4former_tpu.models.backbones.vit import VisionTransformer  # noqa: F401
from s4former_tpu.models.backbones.mit import MixVisionTransformer  # noqa: F401
