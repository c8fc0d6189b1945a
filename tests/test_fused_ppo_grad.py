"""Equivalence tests for the fused Pallas PPO grad kernel and the
multi-epoch minibatch scan (round-5 perf work).

The kernel runs in interpret mode here (CI is CPU); the real-TPU path is
exercised by ``bench.py`` / opt-in ``use_pallas_grad=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.ops.fused_ppo_grad import ppo_grad_minibatch
from fsrl_tpu.types import minibatch_epochs_scan


def _setup(B=256, D=8, A=2, K=2, tie_rows=True):
    algo = PPOLag(D, A, cost_limit=10.0)
    params = algo.init(jax.random.PRNGKey(0)).params
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    obs = jax.random.normal(ks[0], (B, D))
    act = jnp.clip(jax.random.normal(ks[1], (B, A)) * 0.5, -0.99, 0.99)
    logp_old = algo.actor.apply(params["actor"], obs).log_prob(act)
    if tie_rows:
        # half the rows have ratio == 1 exactly — the systematic tie case
        # of every epoch's first grad step (minimum/clip tie-breaking)
        logp_old = logp_old + jnp.where(
            jnp.arange(B) % 2 == 0, 0.0,
            jax.random.normal(ks[2], (B,)) * 0.1)
    adv_raw = jax.random.normal(ks[3], (B, K))
    adv = (adv_raw - adv_raw.mean(0)) / (adv_raw.std(0) + 1e-8)
    ret = jax.random.normal(ks[4], (B, K))
    return algo, params, obs, act, logp_old, adv, ret


def test_fused_grad_matches_jax_grad():
    algo, params, obs, act, logp_old, adv, ret = _setup()
    lam = jnp.array([1.7])
    resc = jnp.asarray(1.0 / 2.7)
    eps_clip, vf_coef = 0.2, 0.25

    def xla_loss(p):
        dist = algo.actor.apply(p["actor"], obs)
        log_p = dist.log_prob(act)
        ratio = jnp.exp(log_p - logp_old)
        advr = adv[:, 0]
        surr2 = jnp.clip(ratio, 1 - eps_clip, 1 + eps_clip) * advr
        loss_rew = -jnp.mean(jnp.minimum(ratio * advr, surr2))
        ct = jnp.mean(ratio[:, None] * adv[:, 1:], axis=0)
        loss_actor = resc * (loss_rew + jnp.sum(lam * ct))
        v = algo.critics.apply(p["critics"], obs)
        return loss_actor + vf_coef * jnp.sum(jnp.mean((ret - v) ** 2, axis=0))

    l0, g0 = jax.value_and_grad(xla_loss)(params)
    l1, aux, g1 = ppo_grad_minibatch(params, obs, act, logp_old, adv, ret,
                                     lam, resc, eps_clip=eps_clip,
                                     vf_coef=vf_coef, interpret=True)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert jax.tree.structure(g0) == jax.tree.structure(g1)
    assert float(aux["kl"]) == pytest.approx(
        float(jnp.mean(logp_old
                       - algo.actor.apply(params["actor"], obs)
                       .log_prob(act))), abs=1e-6)


def test_fused_grad_multi_constraint():
    algo, params, obs, act, logp_old, adv, ret = _setup(K=3)
    # note: K=3 critics means num_costs=2
    algo = PPOLag(8, 2, cost_limit=[10.0, 5.0], num_costs=2)
    params = algo.init(jax.random.PRNGKey(0)).params
    lam = jnp.array([0.5, 2.0])
    resc = jnp.asarray(1.0 / 3.5)

    def xla_loss(p):
        dist = algo.actor.apply(p["actor"], obs)
        log_p = dist.log_prob(act)
        ratio = jnp.exp(log_p - logp_old)
        advr = adv[:, 0]
        surr2 = jnp.clip(ratio, 0.8, 1.2) * advr
        loss_rew = -jnp.mean(jnp.minimum(ratio * advr, surr2))
        ct = jnp.mean(ratio[:, None] * adv[:, 1:], axis=0)
        la = resc * (loss_rew + jnp.sum(lam * ct))
        v = algo.critics.apply(p["critics"], obs)
        return la + 0.25 * jnp.sum(jnp.mean((ret - v) ** 2, axis=0))

    l0, g0 = jax.value_and_grad(xla_loss)(params)
    l1, aux, g1 = ppo_grad_minibatch(params, obs, act, logp_old, adv, ret,
                                     lam, resc, interpret=True)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_minibatch_epochs_scan_matches_per_epoch_semantics():
    """Every sample appears exactly once per epoch; epoch-end flags fire on
    each epoch's last minibatch; sums match the single-epoch scan."""
    rng = jax.random.PRNGKey(3)
    B, n_epochs, n_mb = 240, 3, 4
    batch = {"x": jnp.arange(B, dtype=jnp.float32)[:, None]}

    seen = []

    def body(carry, mb, is_end):
        s = jnp.sum(mb["x"])
        return carry + s, (s, is_end, mb["x"][:, 0])

    total, (sums, ends, rows) = minibatch_epochs_scan(
        rng, batch, n_epochs, n_mb, body, jnp.zeros(()), tile_size=1)
    # epoch-end pattern
    np.testing.assert_array_equal(
        np.asarray(ends),
        np.array([(i + 1) % n_mb == 0 for i in range(n_epochs * n_mb)]))
    # each epoch covers each surviving sample exactly once
    rows = np.asarray(rows).reshape(n_epochs, -1)
    for e in range(n_epochs):
        vals = rows[e].ravel()
        assert len(set(vals.tolist())) == len(vals)
    assert float(total) == pytest.approx(float(np.sum(np.asarray(sums))))


def test_minibatch_epochs_scan_per_leaf_equivalent_shuffle():
    """per_leaf=True yields the same minibatch contents as packed mode for
    the same key (identical tile permutations)."""
    rng = jax.random.PRNGKey(7)
    B = 512
    batch = {"a": jnp.arange(B, dtype=jnp.float32)[:, None],
             "b": jnp.arange(B, dtype=jnp.float32)[:, None] * 2.0}

    def body(carry, mb, is_end):
        return carry, (mb["a"][:, 0], mb["b"][:, 0])

    _, (a0, b0) = minibatch_epochs_scan(rng, batch, 2, 4, body,
                                        jnp.zeros(()), tile_size=4)
    _, (a1, b1) = minibatch_epochs_scan(rng, batch, 2, 4, body,
                                        jnp.zeros(()), tile_size=4,
                                        per_leaf=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
