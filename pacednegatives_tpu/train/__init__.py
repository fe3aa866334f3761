from pacednegatives_tpu.train.state import TrainState, make_optimizer, init_train_state
from pacednegatives_tpu.train.step import (
    make_train_step,
    make_fused_step,
    make_meta_train_step,
)
from pacednegatives_tpu.train.loop import TrainLoop, MetricWriter
from pacednegatives_tpu.train.scored_pool import make_scored_pool_step

__all__ = [
    "TrainState",
    "make_optimizer",
    "init_train_state",
    "make_train_step",
    "make_fused_step",
    "make_meta_train_step",
    "make_scored_pool_step",
    "TrainLoop",
    "MetricWriter",
]
