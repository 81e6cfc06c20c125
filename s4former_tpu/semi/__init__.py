from s4former_tpu.semi.config import SemiConfig  # noqa: F401
from s4former_tpu.semi.train_step import (TrainState, create_train_state,  # noqa: F401
                                          make_semi_train_step)
