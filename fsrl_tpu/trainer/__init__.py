"""Trainer layer (reference L3, ``fsrl/trainer/``): fused on/off-policy
epoch iterators for on-device envs plus host-env trainer variants."""
from fsrl_tpu.trainer.host_trainer import (HostOffpolicyTrainer,
                                           HostOnpolicyTrainer)
from fsrl_tpu.trainer.trainer import (BaseTrainerTPU, OffpolicyTrainerTPU,
                                      OnpolicyTrainerTPU, offpolicy_trainer,
                                      onpolicy_trainer, perf_is_better)

__all__ = ["HostOnpolicyTrainer", "HostOffpolicyTrainer", "BaseTrainerTPU",
           "OnpolicyTrainerTPU", "OffpolicyTrainerTPU",
           "onpolicy_trainer", "offpolicy_trainer", "perf_is_better"]
