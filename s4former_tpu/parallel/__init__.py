from s4former_tpu.parallel.mesh import (batch_sharding, make_mesh,  # noqa: F401
                                        replicate_state, replicated,
                                        shard_batch)
