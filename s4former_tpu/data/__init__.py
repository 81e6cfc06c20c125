from s4former_tpu.data import pipelines  # noqa: F401
from s4former_tpu.data import datasets  # noqa: F401
from s4former_tpu.data.loader import SemiBalanceSampler, SemiLoader  # noqa: F401
from s4former_tpu.data.datasets.custom import build_dataset  # noqa: F401
