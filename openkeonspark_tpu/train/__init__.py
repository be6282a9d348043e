from openkeonspark_tpu.train.loss import margin_ranking_loss  # noqa: F401
from openkeonspark_tpu.train.step import TrainState, build_train_step, build_scan_steps, init_state  # noqa: F401
