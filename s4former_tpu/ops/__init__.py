from s4former_tpu.ops.resize import resize, resize_bilinear, resize_nearest  # noqa: F401
from s4former_tpu.ops.attention import dot_product_attention, multi_head_attention  # noqa: F401
