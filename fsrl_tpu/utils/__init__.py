"""Utilities (reference L0, ``fsrl/utils/``): loggers, checkpointing,
experiment naming/seeding, profiling helpers."""
from fsrl_tpu.utils.logger import (BaseLogger, DummyLogger, TensorboardLogger,
                                   WandbLogger)

__all__ = ["BaseLogger", "DummyLogger", "TensorboardLogger", "WandbLogger"]
