"""Customized DDPG-Lagrangian loop assembled by hand (reference
``examples/customized/train_ddpgl.py``): device ring replay buffer, PID
multiplier updated on-policy from fresh collect stats ("off-on" schedule,
README.md:72), n-step target updates sampled from replay — no Agent, no
Trainer."""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from custom_common import save_model, setup_run
from fsrl_tpu.algos.ddpg_lag import DDPGLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.data.buffer import ReplayBuffer
from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import decache
from fsrl_tpu.types import EpisodeStats


@dataclass
class CustomCfg:
    task: str = "SafetyBallRun-v0"
    cost_limit: float = 25.0
    total_iters: int = 300
    n_envs: int = 8
    steps_per_collect: int = 100
    updates_per_collect: int = 160   # update_per_step=0.2 x 800 steps
    buffer_size: int = 200000
    batch_size: int = 256
    n_step: int = 3
    seed: int = 0
    logdir: str = "logs/custom"
    eval_every: int = 50


@cli(CustomCfg)
def main(cfg: CustomCfg):
    env = make(cfg.task)
    algo = DDPGLag(env.observation_size, env.action_size,
                   cost_limit=cfg.cost_limit, batch_size=cfg.batch_size,
                   n_step=cfg.n_step)
    buffer = ReplayBuffer(cfg.buffer_size // cfg.n_envs, cfg.n_envs)
    logger = setup_run(cfg, "ddpgl_custom")

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k1, k2 = jax.random.split(rng, 3)
    state = decache(algo.init(k1))
    env_state = decache(env.reset_vec(k2, cfg.n_envs))
    stats = decache(EpisodeStats.init(cfg.n_envs, env.num_costs))
    buf_state = decache(buffer.init(env.observation_size, env.action_size,
                                    env.num_costs))
    rollout = make_rollout_fn(env, algo.act_fn, cfg.steps_per_collect)

    @jax.jit
    def train_iter(state, env_state, stats, buf_state, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        buf_state = buffer.add_segment(buf_state, res.transitions)
        state = algo.update_lagrangian(state, res.stats.mean_cost,
                                       res.stats.n_episodes)

        def upd(s, key):
            return algo.update_step(s, buffer, buf_state, key)

        state, ms = jax.lax.scan(
            upd, state, jax.random.split(k2, cfg.updates_per_collect))
        return (state, res.env_state, res.stats, buf_state, rng,
                jax.tree.map(lambda x: x[-1], ms))

    eval_fn = jax.jit(lambda p, r: evaluate(env, algo.act_fn_eval, p, r, 10))

    for it in range(cfg.total_iters):
        state, env_state, stats, buf_state, rng, m = train_iter(
            state, env_state, stats, buf_state, rng)
        if int(stats.n_episodes) > 0:
            logger.store(tab="train", reward=float(stats.mean_reward),
                         cost=float(jnp.sum(stats.mean_cost)))
        if (it + 1) % cfg.eval_every == 0:
            rng, k = jax.random.split(rng)
            out = eval_fn(state.params, k)
            logger.store(tab="test", reward=float(out["reward"]),
                         cost=float(out["cost"]))
            logger.write((it + 1) * cfg.steps_per_collect * cfg.n_envs)
    save_model(logger, state)
    logger.print(f"run dir: {logger.log_dir}")


if __name__ == "__main__":
    main()
