from openkeonspark_tpu.parallel.mesh import (make_mesh, hier_shape,  # noqa: F401
                                             shard_state, shard_sampler)
from openkeonspark_tpu.parallel.sharded import (build_sharded_train_step,  # noqa: F401
                                                make_sharded_step_builder)
from openkeonspark_tpu.parallel.exchange import (  # noqa: F401
    build_exchange_train_step, build_train_step_for,
    make_exchange_step_builder)
from openkeonspark_tpu.parallel.hier import build_hier_train_step  # noqa: F401
from openkeonspark_tpu.parallel.hot import sync_hot_cache  # noqa: F401
