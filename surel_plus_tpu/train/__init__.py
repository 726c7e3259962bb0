from surel_plus_tpu.train.loop import (
    TrainConfig,
    LinkPredictor,
    train_epoch,
    evaluate,
)

__all__ = ["TrainConfig", "LinkPredictor", "train_epoch", "evaluate"]
