"""Evaluate a customized CVPO run directory (reference
``examples/customized/eval_cvpo.py``)."""

import argparse

from custom_common import eval_checkpoint
from fsrl_tpu.algos.cvpo import CVPO


def build(env, config):
    return CVPO(env.observation_size, env.action_size,
                cost_limit=config["cost_limit"],
                max_episode_steps=env.max_episode_steps,
                batch_size=config.get("batch_size", 256),
                sample_act_num=config.get("sample_act_num", 16))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    eval_checkpoint(a.path, build, n_episodes=a.eval_episodes, best=a.best)
