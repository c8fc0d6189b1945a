"""Shared train/eval driver for the per-algorithm example CLIs (reference
``examples/mlp/train_*_agent.py`` / ``eval_*_agent.py``)."""

from __future__ import annotations

import dataclasses
import os

from fsrl_tpu.config.configs import apply_task_preset
from fsrl_tpu.utils.exp_util import auto_name, load_config_and_model, seed_all
from fsrl_tpu.utils.logger import TensorboardLogger


def run_train(cfg, agent_cls, default_cfg):
    seed_all(cfg.seed)
    if cfg.use_default_cfg:
        cfg = apply_task_preset(cfg)
    name = cfg.name or auto_name(default_cfg, cfg, cfg.prefix, cfg.suffix or "")
    group = cfg.group or f"{cfg.task}-cost-{int(cfg.cost_limit)}"
    logdir = os.path.join(cfg.logdir, cfg.project, group)
    logger = TensorboardLogger(logdir, name=name)
    logger.save_config(dataclasses.asdict(cfg))

    agent = agent_cls(
        cfg.task, logger=logger, cost_limit=cfg.cost_limit, seed=cfg.seed,
        **cfg.algo_kwargs(),
    )
    mesh = None
    if cfg.use_mesh:
        from fsrl_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    info = agent.learn(
        epochs=cfg.epochs, step_per_epoch=cfg.step_per_epoch,
        n_envs=cfg.n_envs, steps_per_collect=cfg.steps_per_collect,
        episode_per_test=cfg.episode_per_test,
        save_model_interval=cfg.save_interval,
        reward_threshold=cfg.reward_threshold,
        buffer_size=cfg.buffer_size, update_per_step=cfg.update_per_step,
        mesh=mesh, verbose=cfg.verbose,
    )
    logger.print(f"train done: {info}")
    rew, length, cost = agent.evaluate()
    logger.print(f"final eval: reward {rew:.1f}, cost {cost:.1f}, len {length:.0f}")
    return info


def run_eval(path: str, agent_cls, best: bool = True, n_episodes: int = 10):
    """Reload config.yaml + checkpoint, rebuild the agent, evaluate
    (reference ``eval_ppol_agent.py:31-67``)."""
    config, _ = load_config_and_model(path, best=best, target=None)
    # restrict saved-config keys to the algorithm signature
    agent = agent_cls(config["task"], cost_limit=config["cost_limit"],
                      seed=config.get("seed", 0),
                      **_algo_kwargs_from_config(agent_cls, config))
    _, state = load_config_and_model(path, best=best, target=agent.state)
    agent.state = state
    rew, length, cost = agent.evaluate(n_episodes=n_episodes)
    print(f"Eval reward: {rew:.2f}, cost: {cost:.2f}, length: {length:.1f}")
    return rew, length, cost


def _algo_kwargs_from_config(agent_cls, config: dict) -> dict:
    import inspect
    sig = inspect.signature(agent_cls.algo_cls.__init__)
    kw = {}
    for k, v in config.items():
        if k in sig.parameters and k not in ("self", "obs_dim", "act_dim",
                                             "cost_limit"):
            kw[k] = tuple(v) if isinstance(v, list) else v
    # dataclass field names that differ from ctor names
    if "norm_adv" in config and "advantage_normalization" in sig.parameters:
        kw["advantage_normalization"] = config["norm_adv"]
    return kw
