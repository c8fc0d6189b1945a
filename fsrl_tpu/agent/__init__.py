from fsrl_tpu.agent.agents import (BaseAgentTPU, CPOAgent, CVPOAgent,
                                   DDPGLagAgent, FOCOPSAgent, PPOLagAgent,
                                   SACLagAgent, TRPOLagAgent)

__all__ = ["BaseAgentTPU", "PPOLagAgent", "TRPOLagAgent", "CPOAgent",
           "FOCOPSAgent", "DDPGLagAgent", "SACLagAgent", "CVPOAgent"]
