"""Evaluate a trained CPO run directory (reference
``examples/mlp/eval_cpo_agent.py``)."""

import argparse

from fsrl_tpu.agent import CPOAgent

from common import run_eval

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--best", action="store_true", default=True)
    p.add_argument("--eval_episodes", type=int, default=10)
    a = p.parse_args()
    run_eval(a.path, CPOAgent, best=a.best, n_episodes=a.eval_episodes)
