"""Customized TRPO-Lagrangian loop assembled by hand (reference
``examples/customized/train_trpol.py``): natural-gradient update on the whole
fresh on-policy segment, PID multiplier fed by episodic cost — no Agent, no
Trainer."""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from custom_common import save_model, setup_run
from fsrl_tpu.algos.trpo_lag import TRPOLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import decache
from fsrl_tpu.types import EpisodeStats


@dataclass
class CustomCfg:
    task: str = "SafetyBallCircle-v0"
    cost_limit: float = 25.0
    total_iters: int = 100
    n_envs: int = 32
    steps_per_collect: int = 300
    target_kl: float = 0.005
    optim_critic_iters: int = 20
    seed: int = 0
    logdir: str = "logs/custom"
    eval_every: int = 20


@cli(CustomCfg)
def main(cfg: CustomCfg):
    env = make(cfg.task)
    algo = TRPOLag(env.observation_size, env.action_size,
                   cost_limit=cfg.cost_limit, target_kl=cfg.target_kl,
                   optim_critic_iters=cfg.optim_critic_iters)
    logger = setup_run(cfg, "trpol_custom")

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k1, k2 = jax.random.split(rng, 3)
    state = decache(algo.init(k1))
    env_state = decache(env.reset_vec(k2, cfg.n_envs))
    stats = decache(EpisodeStats.init(cfg.n_envs, env.num_costs))
    rollout = make_rollout_fn(env, algo.act_fn, cfg.steps_per_collect)

    @jax.jit
    def train_iter(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, rng, metrics

    eval_fn = jax.jit(lambda p, r: evaluate(env, algo.act_fn_eval, p, r, 10))

    for it in range(cfg.total_iters):
        state, env_state, stats, rng, m = train_iter(
            state, env_state, stats, rng)
        if int(stats.n_episodes) > 0:
            logger.store(tab="train", reward=float(stats.mean_reward),
                         cost=float(jnp.sum(stats.mean_cost)))
        if (it + 1) % cfg.eval_every == 0:
            rng, k = jax.random.split(rng)
            out = eval_fn(state.params, k)
            logger.store(tab="test", reward=float(out["reward"]),
                         cost=float(out["cost"]),
                         kl=float(m["update/kl"]) if "update/kl" in m else 0.0)
            logger.write((it + 1) * cfg.steps_per_collect * cfg.n_envs)
    save_model(logger, state)
    logger.print(f"run dir: {logger.log_dir}")


if __name__ == "__main__":
    main()
