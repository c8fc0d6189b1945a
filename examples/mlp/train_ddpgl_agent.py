"""Train DDPG-Lagrangian (reference ``examples/mlp/train_ddpgl_agent.py``)."""

from fsrl_tpu.agent import DDPGLagAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import DDPGLagCfg

from common import run_train


@cli(DDPGLagCfg)
def main(cfg: DDPGLagCfg):
    run_train(cfg, DDPGLagAgent, DDPGLagCfg())


if __name__ == "__main__":
    main()
