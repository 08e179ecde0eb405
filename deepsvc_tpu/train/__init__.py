from .optim import label_params, lr_schedule, make_optimizer
from .trainer import PFrameTrainer, StageInfo, TrainState, stage_info

__all__ = [
    "label_params",
    "lr_schedule",
    "make_optimizer",
    "PFrameTrainer",
    "StageInfo",
    "TrainState",
    "stage_info",
]
