from fsrl_tpu.trainer.trainer import (BaseTrainerTPU, OffpolicyTrainerTPU,
                                      OnpolicyTrainerTPU, perf_is_better)

__all__ = ["BaseTrainerTPU", "OnpolicyTrainerTPU", "OffpolicyTrainerTPU",
           "perf_is_better"]
