from s4former_tpu.models.backbones.vit import VisionTransformer  # noqa: F401
