from .image_trainer import ImageCodecTrainer, ImageTrainConfig
from .optim import label_params, lr_schedule, make_optimizer
from .semantic_trainer import SemanticPFrameTrainer
from .trainer import PFrameTrainer, StageInfo, TrainState, stage_info

__all__ = [
    "ImageCodecTrainer",
    "ImageTrainConfig",
    "SemanticPFrameTrainer",
    "label_params",
    "lr_schedule",
    "make_optimizer",
    "PFrameTrainer",
    "StageInfo",
    "TrainState",
    "stage_info",
]
