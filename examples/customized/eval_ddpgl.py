"""Evaluate a customized DDPG-Lagrangian run directory (reference
``examples/customized/eval_ddpgl.py``)."""

import argparse

from custom_common import eval_checkpoint
from fsrl_tpu.algos.ddpg_lag import DDPGLag


def build(env, config):
    return DDPGLag(env.observation_size, env.action_size,
                   cost_limit=config["cost_limit"],
                   batch_size=config.get("batch_size", 256),
                   n_step=config.get("n_step", 3))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    eval_checkpoint(a.path, build, n_episodes=a.eval_episodes, best=a.best)
