from fsrl_tpu.agent.agents import (BaseAgentTPU, CPOAgent, CVPOAgent,
                                   DDPGLagAgent, FOCOPSAgent, PPOLagAgent,
                                   RecurrentPPOLagAgent, SACLagAgent,
                                   TRPOLagAgent)

__all__ = ["BaseAgentTPU", "PPOLagAgent", "RecurrentPPOLagAgent",
           "TRPOLagAgent", "CPOAgent", "FOCOPSAgent", "DDPGLagAgent",
           "SACLagAgent", "CVPOAgent"]
