from s4former_tpu.models.necks.necks import (  # noqa: F401
    FPN, Feature2Pyramid, ICNeck, JPU, MLANeck, MultiLevelNeck)
