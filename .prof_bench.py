import json, time
import jax
import jax.numpy as jnp

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.types import EpisodeStats

env = make("SafetyCarCircle-v0")
N, T = 2048, 128
algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
              repeat=4, n_minibatches=4, compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
state = algo.init(rng)
env_state = env.reset_vec(rng, N)
stats = EpisodeStats.init(N, env.num_costs)
rollout = make_rollout_fn(env, algo.act_fn, T)

@jax.jit
def roll_only(params, env_state, stats, rng):
    return rollout(params, env_state, stats, rng)

@jax.jit
def upd_only(state, tr, mc, ne, rng):
    return algo.update(state, tr, mc, ne, rng)

res = roll_only(state.params, env_state, stats, rng)
jax.block_until_ready(res.transitions.obs)
t0 = time.perf_counter()
for _ in range(10):
    res = roll_only(state.params, env_state, stats, rng)
jax.block_until_ready(res.transitions.obs)
dt_roll = (time.perf_counter() - t0) / 10

st2, m = upd_only(state, res.transitions, res.stats.mean_cost, res.stats.n_episodes, rng)
jax.block_until_ready(m["loss/total"])
t0 = time.perf_counter()
for _ in range(10):
    st2, m = upd_only(state, res.transitions, res.stats.mean_cost, res.stats.n_episodes, rng)
jax.block_until_ready(m["loss/total"])
dt_upd = (time.perf_counter() - t0) / 10

print(json.dumps({"rollout_ms": dt_roll*1e3, "update_ms": dt_upd*1e3,
                  "steps": T*N,
                  "roll_steps_per_s": T*N/dt_roll,
                  "upd_steps_per_s": T*N/dt_upd}))
