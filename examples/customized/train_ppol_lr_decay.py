"""Worked example: learning-rate scheduling with PPO-Lagrangian.

The reference plugs torch ``LambdaLR`` schedulers into every policy and steps
them once per ``policy.update`` (``fsrl/policy/base_policy.py:66,353``;
Tianshou wraps several as ``MultipleLRSchedulers``). TPU-natively a schedule
is just a pure function of the optax gradient-step counter baked into the
jitted update — no host-side ``.step()`` calls, no mutable scheduler objects.

This script trains PPO-Lag on SafetyBallCircle-v0 with the classic
linear-decay-to-zero recipe over the full training budget, expressed in
*update* units exactly like the reference's per-update ``LambdaLR`` cadence
via :func:`fsrl_tpu.algos.common.per_update_schedule`.

Run:  python examples/customized/train_ppol_lr_decay.py --total_iters 200
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from fsrl_tpu.algos.common import per_update_schedule
from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import decache
from fsrl_tpu.types import EpisodeStats
from fsrl_tpu.utils.logger import TensorboardLogger


@dataclass
class LRDecayCfg:
    task: str = "SafetyBallCircle-v0"
    cost_limit: float = 25.0
    lr: float = 5e-4
    total_iters: int = 200        # trainer updates over the whole run
    n_envs: int = 64
    steps_per_collect: int = 256
    repeat: int = 4
    n_minibatches: int = 4
    seed: int = 0
    logdir: str = "logs/ppol-lrdecay"
    eval_every: int = 50


@cli(LRDecayCfg)
def main(cfg: LRDecayCfg):
    env = make(cfg.task)

    # LambdaLR(lambda u: 1 - u / total_updates) equivalent, in update units:
    schedule = per_update_schedule(
        optax.linear_schedule(init_value=cfg.lr, end_value=0.0,
                              transition_steps=cfg.total_iters),
        grad_steps_per_update=cfg.repeat * cfg.n_minibatches,
    )
    algo = PPOLag(env.observation_size, env.action_size,
                  cost_limit=cfg.cost_limit, lr=schedule,
                  repeat=cfg.repeat, n_minibatches=cfg.n_minibatches)
    logger = TensorboardLogger(cfg.logdir, name=f"ppol-lrdecay-{cfg.task}")

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
        state, metrics = algo.update(state, res.transitions,
                                     res.stats.mean_cost,
                                     res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, rng, metrics

    eval_fn = jax.jit(lambda p, r: evaluate(env, algo.act_fn_eval, p, r, 10))

    for it in range(cfg.total_iters):
        state, env_state, stats, rng, m = train_iter(state, env_state, stats,
                                                     rng)
        lr_now = float(schedule(state.gradient_steps))
        if int(stats.n_episodes) > 0:
            logger.store(tab="train", reward=float(stats.mean_reward),
                         cost=float(jnp.sum(stats.mean_cost)), lr=lr_now)
        if (it + 1) % cfg.eval_every == 0:
            rng, k = jax.random.split(rng)
            out = eval_fn(state.params, k)
            logger.store(tab="test", reward=float(out["reward"]),
                         cost=float(out["cost"]))
            logger.write((it + 1) * cfg.steps_per_collect * cfg.n_envs)


if __name__ == "__main__":
    main()
