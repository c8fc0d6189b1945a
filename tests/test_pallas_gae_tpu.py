"""Real-TPU equivalence gate for the Pallas GAE kernel (VERDICT r4 #5: the
kernel must run on TPU in a tested configuration, not only in interpret
mode). Skipped off-TPU — CI pins JAX_PLATFORMS=cpu; run manually on the
chip with `JAX_PLATFORMS= python -m pytest tests/test_pallas_gae_tpu.py`.

The interpret-mode equivalence test (always-on) lives in
tests/test_ops.py::test_gae_pallas_interpret_matches_sequential; the
training-path selection (`gae_impl="pallas"` through PPOLag.update) is
covered below and in the bench_phases.py gae_impl sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU kernel gate (interpret-mode twin runs in test_ops.py)")


def test_pallas_gae_matches_sequential_on_tpu():
    from fsrl_tpu.ops.gae import gae_advantages
    from fsrl_tpu.ops.pallas_gae import gae_advantages_pallas

    T, N, K = 64, 1024, 2
    m = jax.random.normal(jax.random.PRNGKey(0), (T, N, K))
    v = jax.random.normal(jax.random.PRNGKey(1), (T, N, K))
    vn = jax.random.normal(jax.random.PRNGKey(2), (T, N, K))
    ef = jax.random.bernoulli(jax.random.PRNGKey(3), 0.01, (T, N))
    a0, r0 = jax.jit(lambda *x: gae_advantages(*x, 0.99, 0.95))(m, v, vn, ef)
    a1, r1 = jax.jit(lambda *x: gae_advantages_pallas(*x, 0.99, 0.95))(
        m, v, vn, ef)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=2e-5, atol=2e-5)


def test_ppo_update_runs_with_pallas_gae_on_tpu():
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.types import Transition

    algo = PPOLag(8, 2, n_minibatches=2, repeat=2, gae_impl="pallas")
    state = algo.init(jax.random.PRNGKey(0))
    T, N = 16, 8
    k = jax.random.PRNGKey(1)
    tr = Transition(
        obs=jax.random.normal(k, (T, N, 8)), act=jnp.zeros((T, N, 2)),
        obs_next=jax.random.normal(k, (T, N, 8)), reward=jnp.ones((T, N)),
        cost=jnp.ones((T, N, 1)), terminated=jnp.zeros((T, N), bool),
        truncated=jnp.zeros((T, N), bool), logp=jnp.zeros((T, N)))
    state2, m = jax.jit(algo.update)(state, tr, jnp.array([30.0]),
                                     jnp.asarray(5), k)
    assert bool(jnp.isfinite(m["loss/total"]))
