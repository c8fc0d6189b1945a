"""Train CPO (reference ``examples/mlp/train_cpo_agent.py``)."""

from fsrl_tpu.agent import CPOAgent
from fsrl_tpu.config.cli import cli
from fsrl_tpu.config.configs import CPOCfg

from common import run_train


@cli(CPOCfg)
def main(cfg: CPOCfg):
    run_train(cfg, CPOAgent, CPOCfg())


if __name__ == "__main__":
    main()
