"""Worker process for the 2-process multi-host dryrun test.

Each process owns 2 virtual CPU devices; after ``init_multihost`` the global
mesh has 4 devices across 2 processes, and the PPO-Lag train step's gradient/
stat reductions cross the process boundary (Gloo in CI, DCN on a real pod).

Run: python _multihost_worker.py <process_id> <num_processes> <port>
Prints one line ``MHOK <process_id> <loss>`` on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").split("--xla_force_host_platform")[0]
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fsrl_tpu.parallel.mesh import init_multihost, make_multihost_mesh  # noqa: E402

init_multihost(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 2 * nproc, jax.devices()

from fsrl_tpu.algos.ppo_lag import PPOLag  # noqa: E402
from fsrl_tpu.data.collector import make_rollout_fn  # noqa: E402
from fsrl_tpu.envs import make  # noqa: E402
from fsrl_tpu.parallel.mesh import replicate_tree, shard_env_state  # noqa: E402
from fsrl_tpu.types import EpisodeStats  # noqa: E402

mesh = make_multihost_mesh()
env = make("SafetyCarCircle-v0")
N, T = 2 * len(jax.devices()), 8
algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
              n_minibatches=2, repeat=2)

rng = jax.random.PRNGKey(0)
# host-local compute -> numpy (identical on every process) -> global sharding
to_np = lambda t: jax.tree.map(np.asarray, t)
state = replicate_tree(mesh, to_np(algo.init(rng)))
env_state = shard_env_state(mesh, to_np(env.reset_vec(rng, N)))
stats = shard_env_state(mesh, to_np(EpisodeStats.init(N, env.num_costs)))
rollout = make_rollout_fn(env, algo.act_fn, T)


@jax.jit
def train_step(state, env_state, stats, rng):
    rng, k1, k2 = jax.random.split(rng, 3)
    res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
    state, metrics = algo.update(
        state, res.transitions, res.stats.mean_cost, res.stats.n_episodes, k2)
    return state, res.env_state, res.stats, metrics


state, env_state, stats, metrics = train_step(state, env_state, stats, rng)
loss = float(jax.device_get(metrics["loss/total"]))
assert np.isfinite(loss), loss
print(f"MHOK {pid} {loss:.6f}", flush=True)
