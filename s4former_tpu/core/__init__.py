from s4former_tpu.core import checkpoint, metrics, optim  # noqa: F401
