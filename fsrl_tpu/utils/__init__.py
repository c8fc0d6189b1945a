from fsrl_tpu.utils.logger import (BaseLogger, DummyLogger, TensorboardLogger,
                                   WandbLogger)

__all__ = ["BaseLogger", "DummyLogger", "TensorboardLogger", "WandbLogger"]
