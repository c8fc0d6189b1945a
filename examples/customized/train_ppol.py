"""Customized PPO-Lagrangian training loop assembled by hand (reference
``examples/customized/train_ppol.py``): build the algorithm, write your own
jitted collect→update iteration, own the logging/checkpoint cadence — no
Agent, no Trainer.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from custom_common import save_model, setup_run
from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import decache
from fsrl_tpu.types import EpisodeStats


@dataclass
class CustomCfg:
    task: str = "SafetyCarCircle-v0"
    cost_limit: float = 10.0
    total_iters: int = 200
    n_envs: int = 32
    steps_per_collect: int = 300
    repeat: int = 4
    n_minibatches: int = 4
    lr: float = 5e-4
    seed: int = 0
    logdir: str = "logs/custom"
    eval_every: int = 20


@cli(CustomCfg)
def main(cfg: CustomCfg):
    env = make(cfg.task)
    algo = PPOLag(env.observation_size, env.action_size,
                  cost_limit=cfg.cost_limit, lr=cfg.lr, repeat=cfg.repeat,
                  n_minibatches=cfg.n_minibatches)
    logger = setup_run(cfg, "ppol_custom")

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
        # on-policy: PID multiplier fed by this collect's episodic cost, then
        # the whole fresh segment is the update batch (no replay)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, rng, metrics

    eval_fn = jax.jit(lambda p, r: evaluate(env, algo.act_fn_eval, p, r, 10))

    best = -jnp.inf
    for it in range(cfg.total_iters):
        state, env_state, stats, rng, m = train_iter(
            state, env_state, stats, rng)
        if int(stats.n_episodes) > 0:
            logger.store(tab="train", reward=float(stats.mean_reward),
                         cost=float(jnp.sum(stats.mean_cost)))
        if (it + 1) % cfg.eval_every == 0:
            rng, k = jax.random.split(rng)
            out = eval_fn(state.params, k)
            rew, cost = float(out["reward"]), float(out["cost"])
            logger.store(tab="test", reward=rew, cost=cost)
            logger.write((it + 1) * cfg.steps_per_collect * cfg.n_envs)
            # feasibility-first best rule, by hand
            if cost <= cfg.cost_limit and rew > best:
                best = rew
                save_model(logger, state, best=True)
    save_model(logger, state)
    logger.print(f"run dir: {logger.log_dir}")


if __name__ == "__main__":
    main()
