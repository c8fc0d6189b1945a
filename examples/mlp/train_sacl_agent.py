"""Train SAC-Lagrangian (reference ``examples/mlp/train_sacl_agent.py``)."""

from fsrl_tpu.agent import SACLagAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import SACLagCfg

from common import run_train


@cli(SACLagCfg)
def main(cfg: SACLagCfg):
    run_train(cfg, SACLagAgent, SACLagCfg())


if __name__ == "__main__":
    main()
