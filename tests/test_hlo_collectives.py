"""Machine-checkable HLO collective audit (docs/distributed.md's locality
contract, previously prose-only): the partitioned data-parallel PPO-Lag
update must contain ZERO all-gathers (env-major flatten + block-local
shuffle keep the batch sharded end-to-end) and collapse its gradient/stat
reductions into a small number of fused all-reduces. A regression that
replicates the rollout (e.g. a time-major flatten or a global minibatch
permutation) reintroduces full-batch all-gathers and fails this test."""

import re

import jax

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_state
from fsrl_tpu.types import EpisodeStats


def test_dp_update_has_no_allgather_and_fused_allreduce(devices):
    n_dev = 8
    mesh = make_mesh(n_dev)
    env = make("SafetyBallRun-v0")
    N, T = 2 * n_dev, 16
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=2, n_minibatches=2, dp_blocks=n_dev)
    rng = jax.random.PRNGKey(0)
    state = replicate_tree(mesh, algo.init(rng))
    env_state = shard_env_state(mesh, env.reset_vec(rng, N))
    stats = shard_env_state(mesh, EpisodeStats.init(N, env.num_costs))
    rollout = make_rollout_fn(env, algo.act_fn, T)

    def train_step(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, metrics

    compiled = jax.jit(train_step).lower(state, env_state, stats,
                                         jax.random.PRNGKey(2)).compile()
    hlo = compiled.as_text()

    n_allgather = len(re.findall(r"\ball-gather(?:-start)?\(", hlo))
    n_allreduce = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))

    assert n_allgather == 0, (
        f"partitioned train step contains {n_allgather} all-gathers — the "
        "batch went replicated (locality contract broken)")
    # gradient + episodic-stat reductions; XLA fuses parameter-sized
    # all-reduces, small scalar stat reductions may stay separate
    assert 1 <= n_allreduce <= 8, (
        f"expected a handful of fused all-reduces, found {n_allreduce}")


def test_cpo_dp_cg_reductions_are_global(devices):
    """CPO under a dp mesh (VERDICT r4 #4): the partitioned step's HLO must
    contain all-reduces (the CG/FVP dot products and surrogate means reduce
    globally) and no full-batch all-gathers (the rollout stays sharded)."""
    from fsrl_tpu.algos.cpo import CPO

    n_dev = 8
    mesh = make_mesh(n_dev)
    env = make("SafetyBallRun-v0")
    N, T = 2 * n_dev, 16
    algo = CPO(env.observation_size, env.action_size, cost_limit=10.0)
    rng = jax.random.PRNGKey(0)
    state = replicate_tree(mesh, algo.init(rng))
    env_state = shard_env_state(mesh, env.reset_vec(rng, N))
    stats = shard_env_state(mesh, EpisodeStats.init(N, env.num_costs))
    rollout = make_rollout_fn(env, algo.act_fn, T)

    def train_step(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, metrics

    hlo = jax.jit(train_step).lower(
        state, env_state, stats, jax.random.PRNGKey(2)).compile().as_text()
    n_allgather = len(re.findall(r"\ball-gather(?:-start)?\(", hlo))
    n_allreduce = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))
    assert n_allreduce > 0, (
        "partitioned CPO step has no all-reduce: the CG/FVP dot products "
        "are not globally reduced — sharded math silently diverged")
    assert n_allgather == 0, (
        f"partitioned CPO step contains {n_allgather} all-gathers — the "
        "batch went replicated")
