"""Evaluate a customized PPO-Lagrangian run directory (reference
``examples/customized/eval_ppol.py``): reload config.yaml + checkpoint,
rebuild the bare algorithm, run episode-exact evaluation."""

import argparse

from custom_common import eval_checkpoint
from fsrl_tpu.algos.ppo_lag import PPOLag


def build(env, config):
    return PPOLag(env.observation_size, env.action_size,
                  cost_limit=config["cost_limit"],
                  repeat=config.get("repeat", 4),
                  n_minibatches=config.get("n_minibatches", 4),
                  lr=config.get("lr", 5e-4))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    eval_checkpoint(a.path, build, n_episodes=a.eval_episodes, best=a.best)
