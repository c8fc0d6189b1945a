"""Evaluate a customized SAC-Lagrangian run directory (reference
``examples/customized/eval_sacl.py``) — pairs with ``train_sac_custom.py``."""

import argparse

from custom_common import eval_checkpoint
from fsrl_tpu.algos.sac_lag import SACLag


def build(env, config):
    return SACLag(env.observation_size, env.action_size,
                  cost_limit=config["cost_limit"],
                  batch_size=config.get("batch_size", 256))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    eval_checkpoint(a.path, build, n_episodes=a.eval_episodes, best=a.best)
