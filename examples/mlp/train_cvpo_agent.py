"""Train CVPO (reference ``examples/mlp/train_cvpo_agent.py``)."""

from fsrl_tpu.agent import CVPOAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import CVPOCfg

from common import run_train


@cli(CVPOCfg)
def main(cfg: CVPOCfg):
    run_train(cfg, CVPOAgent, CVPOCfg())


if __name__ == "__main__":
    main()
