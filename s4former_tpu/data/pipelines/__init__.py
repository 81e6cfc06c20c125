from s4former_tpu.data.pipelines.transforms import *  # noqa: F401,F403
from s4former_tpu.data.pipelines.extra_transforms import *  # noqa: F401,F403
