"""Train FOCOPS (reference ``examples/mlp/train_focops_agent.py``)."""

from fsrl_tpu.agent import FOCOPSAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import FOCOPSCfg

from common import run_train


@cli(FOCOPSCfg)
def main(cfg: FOCOPSCfg):
    run_train(cfg, FOCOPSAgent, FOCOPSCfg())


if __name__ == "__main__":
    main()
