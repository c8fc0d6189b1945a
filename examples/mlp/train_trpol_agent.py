"""Train TRPO-Lagrangian (reference ``examples/mlp/train_trpol_agent.py``)."""

from fsrl_tpu.agent import TRPOLagAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import TRPOLagCfg

from common import run_train


@cli(TRPOLagCfg)
def main(cfg: TRPOLagCfg):
    run_train(cfg, TRPOLagAgent, TRPOLagCfg())


if __name__ == "__main__":
    main()
