"""Off-policy fuse_iters (k collect+update-chunk cycles scanned inside one
jitted dispatch) must match k sequential dispatches: same rng threading, same
buffer contents, same PID stepping, same params out."""

import jax
import numpy as np

from fsrl_tpu.algos.sac_lag import SACLag
from fsrl_tpu.envs import make
from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU


def build(fuse):
    env = make("SafetyBallRun-v0")
    algo = SACLag(env.observation_size, env.action_size, cost_limit=10.0,
                  batch_size=32)
    return OffpolicyTrainerTPU(
        algo, env, None, cost_limit=10.0, seed=0, n_envs=4,
        steps_per_collect=16, epochs=1, step_per_epoch=256,
        episode_per_test=2, verbose=False, log_every=10 ** 9,
        update_per_step=0.25, update_chunk=8, buffer_size=4096,
        fuse_iters=fuse)


def test_fused_matches_sequential(devices):
    t1 = build(1)
    t2 = build(4)
    # one epoch = 256 steps = 4 sequential == 1 fused dispatch
    next(iter(t1))
    next(iter(t2))
    assert t1.env_step == t2.env_step == 256
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # buffer contents identical too (same rollout stream)
    for a, b in zip(jax.tree.leaves(t1.buf_state.data),
                    jax.tree.leaves(t2.buf_state.data)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
