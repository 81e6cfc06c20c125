from s4former_tpu.models.segmentors.encoder_decoder import (  # noqa: F401
    EncoderDecoder, build_segmentor)
from s4former_tpu.models.segmentors.cascade_encoder_decoder import CascadeEncoderDecoder  # noqa: F401
