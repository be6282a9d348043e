from openkeonspark_tpu.ckpt.checkpoint import (CheckpointManager,  # noqa: F401
                                               export_parameters,
                                               import_parameters,
                                               latest_step,
                                               warm_start_from,
                                               warm_start_path)
