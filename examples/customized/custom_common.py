"""Shared pieces for the hand-assembled (agent-layer-bypassing) example
scripts — the analog of what the reference's ``examples/customized/*`` scripts
duplicate inline (``train_cvpo.py:113-253``, ``eval_ppol.py:24-66``).

Each customized train script builds its own algorithm + jitted loop; these
helpers only cover the boring edges: run-directory setup (config.yaml +
orbax checkpoint, mirroring the reference's logger-mediated save protocol,
``base_logger.py:118-163``) and checkpoint-reload evaluation.
"""

from __future__ import annotations

import dataclasses
import os

import jax

from fsrl_tpu.data.collector import evaluate
from fsrl_tpu.envs import make
from fsrl_tpu.utils.checkpoint import save_checkpoint
from fsrl_tpu.utils.exp_util import load_config_and_model, seed_all
from fsrl_tpu.utils.logger import TensorboardLogger


def setup_run(cfg, name: str) -> TensorboardLogger:
    """Create the run directory, snapshot the config, return a logger."""
    seed_all(cfg.seed)
    logdir = os.path.join(cfg.logdir, f"{name}-{cfg.task}-s{cfg.seed}")
    logger = TensorboardLogger(logdir, name=name)
    logger.save_config(dataclasses.asdict(cfg))
    return logger


def save_model(logger: TensorboardLogger, state, best: bool = False) -> str:
    """Orbax-checkpoint the whole TrainState under the run directory
    (the reference saves ``{"model": state_dict}``; here the TrainState pytree
    carries params + optimizers + multiplier/dual state in one piece)."""
    name = "model_best" if best else "model"
    path = os.path.join(logger.log_dir, "checkpoint", name)
    save_checkpoint(path, state)
    return path


def eval_checkpoint(path: str, build_algo, n_episodes: int = 10,
                    best: bool = False, seed: int = 0):
    """Reload ``config.yaml`` + checkpoint from a customized run directory,
    rebuild the algorithm with ``build_algo(env, config)``, and run an
    episode-exact evaluation (reference ``examples/customized/eval_*.py``)."""
    config, _ = load_config_and_model(path, best=best, target=None)
    env = make(config["task"])
    algo = build_algo(env, config)
    state = algo.init(jax.random.PRNGKey(seed))
    _, state = load_config_and_model(path, best=best, target=state)
    out = jax.jit(
        lambda p, r: evaluate(env, algo.act_fn_eval, p, r, n_episodes)
    )(state.params, jax.random.PRNGKey(seed + 1))
    rew = float(out["reward"])
    cost = float(out["cost"])
    length = float(out["length"])
    print(f"Eval reward: {rew:.2f}, cost: {cost:.2f}, length: {length:.1f}")
    return rew, length, cost
