"""Algorithm layer (reference L1, ``fsrl/policy/``): the seven safe-RL
algorithms as pure-function updates over flax.struct TrainState pytrees."""
from fsrl_tpu.algos.ppo_lag import PPOLag, PPOLagState
from fsrl_tpu.algos.ppo_lag_rnn import RecurrentPPOLag, RecurrentPPOLagState
from fsrl_tpu.algos.trpo_lag import TRPOLag, TRPOLagState
from fsrl_tpu.algos.cpo import CPO, CPOState
from fsrl_tpu.algos.focops import FOCOPS, FOCOPSState
from fsrl_tpu.algos.ddpg_lag import DDPGLag, DDPGLagState
from fsrl_tpu.algos.sac_lag import SACLag, SACLagState
from fsrl_tpu.algos.cvpo import CVPO, CVPOState

__all__ = ["PPOLag", "TRPOLag", "CPO", "FOCOPS", "DDPGLag", "SACLag", "CVPO",
           "RecurrentPPOLag",
           "PPOLagState", "TRPOLagState", "CPOState", "FOCOPSState",
           "DDPGLagState", "SACLagState", "CVPOState", "RecurrentPPOLagState"]
