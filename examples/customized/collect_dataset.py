"""Offline safe-RL dataset generation (reference
``examples/customized/collect_dataset.py``): train TRPO-Lagrangian while
sweeping the cost limit from ``cost_start`` to ``cost_end`` so collected
trajectories cover the reward/cost Pareto surface, mirror every rollout segment
into a grid-filtered TrajectoryBuffer, and export HDF5.

TPU twist: the training rollouts happen on device; each collected segment is
pulled to host once and sliced into episodes by the TrajectoryBuffer.
"""

from dataclasses import dataclass

import jax
import numpy as np

from fsrl_tpu.algos.trpo_lag import TRPOLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.data.traj_buf import TrajectoryBuffer
from fsrl_tpu.envs import make
from fsrl_tpu.types import EpisodeStats


@dataclass
class CollectCfg:
    task: str = "SafetyBallCircle-v0"
    cost_start: float = 10.0
    cost_end: float = 80.0
    epochs: int = 50
    iters_per_epoch: int = 4
    n_envs: int = 20
    steps_per_collect: int = 500
    max_trajectory: int = 2000
    rmin: float = -np.inf
    rmax: float = np.inf
    cmin: float = -np.inf
    cmax: float = np.inf
    seed: int = 0
    logdir: str = "logs/datasets"
    dataset_name: str = "dataset.hdf5"


@cli(CollectCfg)
def main(cfg: CollectCfg):
    env = make(cfg.task)
    algo = TRPOLag(env.observation_size, env.action_size,
                   cost_limit=cfg.cost_start, target_kl=0.005)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k = jax.random.split(rng)
    state = algo.init(k)
    env_state = env.reset_vec(rng, cfg.n_envs)
    stats = EpisodeStats.init(cfg.n_envs, env.num_costs)
    rollout = make_rollout_fn(env, algo.act_fn, cfg.steps_per_collect)
    traj_buf = TrajectoryBuffer(max_trajectory=cfg.max_trajectory,
                                rmin=cfg.rmin, rmax=cfg.rmax,
                                cmin=cfg.cmin, cmax=cfg.cmax)

    import jax.numpy as jnp

    @jax.jit
    def train_iter(state, env_state, stats, rng, cost_limit):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        # sweepable cost limit: runtime override, no retrace per epoch
        state, metrics = algo.update(state, res.transitions,
                                     res.stats.mean_cost,
                                     res.stats.n_episodes, k2,
                                     cost_limit=cost_limit)
        return state, res, rng, metrics

    for epoch in range(cfg.epochs):
        # cost-limit sweep over the Pareto surface (collect_dataset.py:28-33)
        frac = epoch / max(cfg.epochs - 1, 1)
        limit = cfg.cost_start + frac * (cfg.cost_end - cfg.cost_start)
        limit_arr = jnp.asarray([limit], jnp.float32)
        for _ in range(cfg.iters_per_epoch):
            state, res, rng, metrics = train_iter(
                state, env_state, stats, rng, limit_arr)
            env_state, stats = res.env_state, res.stats
            traj_buf.store_segment(res.transitions)
        print(f"epoch {epoch:3d} limit {limit:6.1f} "
              f"trajs {traj_buf.num_trajectories:5d} "
              f"transitions {len(traj_buf):8d}", flush=True)

    path = traj_buf.save(cfg.logdir, cfg.dataset_name)
    print(f"saved dataset to {path}")


if __name__ == "__main__":
    main()
