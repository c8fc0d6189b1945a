"""Train PPO-Lagrangian (reference ``examples/mlp/train_ppol_agent.py``)."""

from fsrl_tpu.agent import PPOLagAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import PPOLagCfg

from common import run_train


@cli(PPOLagCfg)
def main(cfg: PPOLagCfg):
    run_train(cfg, PPOLagAgent, PPOLagCfg())


if __name__ == "__main__":
    main()
