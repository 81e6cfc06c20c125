from s4former_tpu.models.losses.cross_entropy import (  # noqa: F401
    CrossEntropyLoss, accuracy, binary_cross_entropy_loss, cross_entropy_loss,
    softmax_cross_entropy_with_ignore)
from s4former_tpu.models.losses.extra_losses import (  # noqa: F401
    DiceLoss, FocalLoss, LovaszLoss, OHEM_CrossEntropyLoss)
from s4former_tpu.models.losses.extra_losses import EdgeLoss  # noqa: F401
