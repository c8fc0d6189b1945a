"""Agent layer (reference L4): per-algorithm factories with the reference
default recipes plus convenience ``learn``/``evaluate`` (``fsrl/agent/``)."""
from fsrl_tpu.agent.agents import (BaseAgentTPU, CPOAgent, CVPOAgent,
                                   DDPGLagAgent, FOCOPSAgent, PPOLagAgent,
                                   RecurrentPPOLagAgent, SACLagAgent,
                                   TRPOLagAgent)

__all__ = ["BaseAgentTPU", "PPOLagAgent", "RecurrentPPOLagAgent",
           "TRPOLagAgent", "CPOAgent", "FOCOPSAgent", "DDPGLagAgent",
           "SACLagAgent", "CVPOAgent"]
