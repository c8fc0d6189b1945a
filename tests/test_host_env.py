"""Host Gymnasium adapter tests (the reference's collector tests use CartPole
with a dummy random policy, ``tests/test_collector.py``)."""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.envs.host_env import HostCollector, HostVectorEnv


class CostyWrapper(gym.Wrapper):
    """Adds a synthetic info['cost'] signal like Bullet-Safety-Gym envs."""

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        info["cost"] = float(abs(np.asarray(obs).ravel()[0]) > 1.0)
        return obs, rew, term, trunc, info


def make_env():
    return CostyWrapper(gym.make("CartPole-v1"))


def test_host_vector_env_step():
    venv = HostVectorEnv([make_env for _ in range(4)])
    obs = venv.reset(seed=0)
    assert obs.shape == (4, venv.observation_size)
    acts = np.zeros((4,), np.int64)
    obs, rew, cost, term, trunc = venv.step(acts)
    assert obs.shape == (4, venv.observation_size)
    assert rew.shape == (4,) and cost.shape == (4,)
    venv.close()


def test_host_collector_episode_exact():
    venv = HostVectorEnv([make_env for _ in range(3)])

    def act_fn(params, obs, rng):
        a = jax.random.randint(rng, (obs.shape[0],), 0, 2)
        return a, jnp.zeros(obs.shape[0])

    # discrete action hack: collector clips/rescales; CartPole takes {0,1} —
    # bypass scaling by setting bounds to match
    venv.action_low, venv.action_high = 0.0, 1.0

    class IntCollector(HostCollector):
        pass

    coll = HostCollector(venv)
    # wrap act_fn to emit ints after scaling
    def act_int(params, obs, rng):
        a, lp = act_fn(params, obs, rng)
        return 2.0 * a - 1.0, lp  # [-1,1] → scaled to {0,1} by collector

    stats = coll.collect(act_int, {}, n_episode=5, rng=jax.random.PRNGKey(0))
    assert stats["n/ep"] == 5
    assert stats["len"] > 5
    assert stats["cost"] >= 0.0
    venv.close()
