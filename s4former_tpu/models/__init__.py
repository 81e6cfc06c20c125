"""Model zoo: importing this package registers all components."""
from s4former_tpu.models import backbones  # noqa: F401
from s4former_tpu.models import decode_heads  # noqa: F401
from s4former_tpu.models import losses  # noqa: F401
from s4former_tpu.models import necks  # noqa: F401
from s4former_tpu.models import segmentors  # noqa: F401
from s4former_tpu.models.segmentors.encoder_decoder import build_segmentor  # noqa: F401
from s4former_tpu.models.init_utils import init_segmentor_variables  # noqa: F401
