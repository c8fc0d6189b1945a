"""Evaluate a customized TRPO-Lagrangian run directory (reference
``examples/customized/eval_trpol.py``)."""

import argparse

from custom_common import eval_checkpoint
from fsrl_tpu.algos.trpo_lag import TRPOLag


def build(env, config):
    return TRPOLag(env.observation_size, env.action_size,
                   cost_limit=config["cost_limit"],
                   target_kl=config.get("target_kl", 0.001),
                   optim_critic_iters=config.get("optim_critic_iters", 20))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    eval_checkpoint(a.path, build, n_episodes=a.eval_episodes, best=a.best)
