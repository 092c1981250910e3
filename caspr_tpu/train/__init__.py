from .trackers import TrainLossTracker, TestStatTracker, log, print_stats
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_weights,
    load_encoder_weights_from_full,
)
from .loop import make_train_step, make_eval_step, run_one_epoch
