from openkeonspark_tpu.parallel.mesh import (make_mesh,  # noqa: F401
                                             shard_state, shard_sampler)
from openkeonspark_tpu.parallel.sharded import (build_sharded_train_step,  # noqa: F401
                                                make_sharded_step_builder)
