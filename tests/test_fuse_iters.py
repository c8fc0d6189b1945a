"""fuse_iters (k collect+update iterations scanned inside one jitted
dispatch) must be semantically identical to k sequential dispatches: same
rng threading, same PID stepping per iteration, same params out, and step
accounting scaled by k."""

import jax
import numpy as np

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import OnpolicyTrainerTPU


def build(fuse):
    env = make("SafetyBallRun-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=2, n_minibatches=2)
    return OnpolicyTrainerTPU(
        algo, env, None, cost_limit=10.0, seed=0, n_envs=4,
        steps_per_collect=16, epochs=1, step_per_epoch=128,
        episode_per_test=2, verbose=False, log_every=10 ** 9,
        fuse_iters=fuse)


def test_fused_matches_sequential(devices):
    t1 = build(1)
    t2 = build(2)
    # one epoch = 128 steps = 2 fused dispatches == 4 sequential dispatches
    next(iter(t1))
    next(iter(t2))
    assert t1.env_step == t2.env_step == 128
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
