from openkeonspark_tpu.sampling.device import (DeviceSampler, SampledBatch,  # noqa: F401
                                               batched_upper_bound,
                                               flatten_reference_layout)
