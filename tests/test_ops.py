"""Numerical unit tests for the return/multiplier/trust-region kernels against
tiny hand-computed (numpy) references — coverage the reference repo lacks
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.ops.cg import conjugate_gradient, make_fvp
from fsrl_tpu.ops.gae import discounted_returns, gae_advantages
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, filtered_pid_step,
                                   pid_step, rescaling_factor)
from fsrl_tpu.ops.nstep import nstep_forward_indices, nstep_targets
from fsrl_tpu.ops.running_stats import RunningMeanStd


def np_gae(value, value_next, rew, end_flag, gamma, lam):
    """Direct numpy port of the reference numba kernel semantics
    (base_policy.py:524-540) for verification."""
    returns = np.zeros_like(rew)
    delta = rew + value_next * gamma - value
    discount = (1.0 - end_flag) * (gamma * lam)
    gae = 0.0
    for i in range(len(rew) - 1, -1, -1):
        gae = delta[i] + discount[i] * gae
        returns[i] = gae
    return returns


def test_gae_matches_reference_recurrence():
    rng = np.random.RandomState(0)
    T = 37
    rew = rng.randn(T).astype(np.float32)
    v = rng.randn(T).astype(np.float32)
    vn = rng.randn(T).astype(np.float32)
    end = (rng.rand(T) < 0.15)
    want = np_gae(v, vn, rew, end.astype(np.float32), 0.99, 0.95)

    adv, ret = gae_advantages(
        jnp.asarray(rew)[:, None, None], jnp.asarray(v)[:, None, None],
        jnp.asarray(vn)[:, None, None], jnp.asarray(end)[:, None], 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv[:, 0, 0]), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret[:, 0, 0]), want + v, rtol=1e-5, atol=1e-5)


def test_gae_multi_channel_and_env():
    rng = np.random.RandomState(1)
    T, N, K = 19, 3, 2
    rew = rng.randn(T, N, K).astype(np.float32)
    v = rng.randn(T, N, K).astype(np.float32)
    vn = rng.randn(T, N, K).astype(np.float32)
    end = rng.rand(T, N) < 0.2
    adv, _ = gae_advantages(jnp.asarray(rew), jnp.asarray(v), jnp.asarray(vn),
                            jnp.asarray(end), 0.9, 0.7)
    for n in range(N):
        for k in range(K):
            want = np_gae(v[:, n, k], vn[:, n, k], rew[:, n, k],
                          end[:, n].astype(np.float32), 0.9, 0.7)
            np.testing.assert_allclose(np.asarray(adv[:, n, k]), want, rtol=1e-4,
                                       atol=1e-4)


def test_discounted_returns_simple():
    # two steps, no end: G0 = r0 + g*r1 + g^2*b
    m = jnp.array([[[1.0]], [[2.0]]])
    end = jnp.zeros((2, 1), bool)
    boot = jnp.array([[3.0]])
    rets = discounted_returns(m, end, boot, 0.5)
    np.testing.assert_allclose(np.asarray(rets[:, 0, 0]), [1 + 0.5 * 2 + 0.25 * 3,
                                                           2 + 0.5 * 3])


def test_pid_lagrangian_matches_reference():
    """Trace the exact reference PID recurrence (optim_util.py:28-41)."""
    kp, ki, kd = 0.05, 0.0005, 0.1
    limits = jnp.array([10.0])
    st = PIDLagrangianState.init(1)
    e_old, e_int = 0.0, 0.0
    for cost in [25.0, 18.0, 9.0, 5.0, 30.0]:
        st = pid_step(st, jnp.array([cost]), limits, kp, ki, kd)
        e_new = cost - 10.0
        e_diff = max(0.0, e_new - e_old)
        e_int = max(0.0, e_int + e_new)
        lam = max(0.0, kp * e_new + ki * e_int + kd * e_diff)
        e_old = e_new
        assert float(st.multiplier[0]) == pytest.approx(lam, rel=1e-6)
    # rescaling trick
    assert float(rescaling_factor(st.multiplier)) == pytest.approx(
        1.0 / (float(st.multiplier[0]) + 1.0))


def test_pid_reduces_to_sgd_ascent():
    st = PIDLagrangianState.init(1)
    st = pid_step(st, jnp.array([20.0]), jnp.array([10.0]), 0.0, 0.1, 0.0)
    st = pid_step(st, jnp.array([20.0]), jnp.array([10.0]), 0.0, 0.1, 0.0)
    assert float(st.multiplier[0]) == pytest.approx(0.1 * 20.0)  # ki * integral


def test_conjugate_gradient_solves_spd():
    rng = np.random.RandomState(2)
    A_ = rng.randn(8, 8)
    A = A_ @ A_.T + 8 * np.eye(8)
    b = rng.randn(8)
    x = conjugate_gradient(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), n_iters=20)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-4,
                               atol=1e-4)


def test_fvp_is_hessian_vector_product():
    # KL of a 1-param gaussian mean: kl(p) = 0.5*(p - p0)^2 → H = 1
    params = {"w": jnp.array([0.3, -0.2])}
    p0 = jnp.array([0.3, -0.2])
    kl_fn = lambda p: 0.5 * jnp.sum((p["w"] - p0) ** 2)
    fvp = make_fvp(kl_fn, params, damping=0.0)
    v = jnp.array([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(fvp(v)), np.asarray(v), atol=1e-6)


def test_nstep_targets_match_naive():
    """3-env ring layout, hand-checked 2-step target with an episode break."""
    # flat layout: idx = t * N + env, N=1 here for clarity
    metrics = jnp.array([[1.0], [2.0], [4.0], [8.0]])
    end = jnp.array([False, True, False, False])
    next_flat = jnp.array([1, 2, 3, 3])
    gamma = 0.5
    idx = jnp.array([0, 2])
    chain = nstep_forward_indices(idx, next_flat, 2)
    np.testing.assert_array_equal(np.asarray(chain), [[0, 2], [1, 3]])
    target_q = jnp.array([[10.0], [20.0]])  # masked Q at terminal index
    got = nstep_targets(metrics, end, target_q, chain, gamma)
    # sample 0: t0 (end at t1): G = r0 + g*r1, ep ends → no bootstrap beyond:
    #   reference recurrence: gammas=2 unless end; end at n=1 (idx 1) → gammas=2?
    #   walk n=1: now=1 end→returns=0,gammas=2; returns=2+0.5*0=2
    #   walk n=0: now=0 not end; returns=1+0.5*2=2; target=q*g^2*? gammas=2
    #   → G = 10*0.25 + 2 = 4.5 ... but end at terminal means q should be masked
    #   by value_mask upstream; here q=10 retained deliberately to check math.
    assert float(got[0, 0]) == pytest.approx(1 + 0.5 * 2 + 0.25 * 10)
    # sample 1: no end in chain: G = r2 + g*r3 + g^2 * q
    assert float(got[1, 0]) == pytest.approx(4 + 0.5 * 8 + 0.25 * 20)


def test_nstep_end_resets_gamma_exponent():
    # end at the FIRST step of the chain: only r0 counts, bootstrap gamma^1
    metrics = jnp.array([[5.0], [7.0]])
    end = jnp.array([True, False])
    next_flat = jnp.array([1, 1])
    chain = nstep_forward_indices(jnp.array([0]), next_flat, 2)
    got = nstep_targets(metrics, end, jnp.array([[100.0]]), chain, 0.5)
    # reference recurrence: n=1: now=1, no end, returns=7; n=0: now=0 end →
    # returns=0, gammas=1, returns=5+0.5*0=5 → G=5 + 100*0.5
    assert float(got[0, 0]) == pytest.approx(5 + 0.5 * 100)


def test_running_mean_std_welford():
    rng = np.random.RandomState(3)
    data = rng.randn(1000, 4) * 3 + 1
    rms = RunningMeanStd.init((4,))
    for chunk in np.split(data, 10):
        rms = rms.update(jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(rms.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rms.var), data.var(0), rtol=1e-3)


def test_gae_pscan_matches_sequential():
    from fsrl_tpu.ops.gae import gae_advantages_pscan
    rng = np.random.RandomState(5)
    T, N, K = 64, 4, 2
    m = rng.randn(T, N, K).astype(np.float32)
    v = rng.randn(T, N, K).astype(np.float32)
    vn = rng.randn(T, N, K).astype(np.float32)
    end = rng.rand(T, N) < 0.1
    a1, r1 = gae_advantages(jnp.asarray(m), jnp.asarray(v), jnp.asarray(vn),
                            jnp.asarray(end), 0.99, 0.95)
    a2, r2 = gae_advantages_pscan(jnp.asarray(m), jnp.asarray(v),
                                  jnp.asarray(vn), jnp.asarray(end), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=2e-5,
                               atol=2e-5)


def test_gae_pallas_interpret_matches_sequential():
    """Pallas kernel (interpret mode on CPU) vs the sequential reference."""
    from fsrl_tpu.ops.gae import gae_advantages
    from fsrl_tpu.ops.pallas_gae import gae_advantages_pallas
    rng = np.random.RandomState(7)
    T, N, K = 16, 5, 2   # B=10 → exercises lane padding
    m = rng.randn(T, N, K).astype(np.float32)
    v = rng.randn(T, N, K).astype(np.float32)
    vn = rng.randn(T, N, K).astype(np.float32)
    end = rng.rand(T, N) < 0.2
    a1, r1 = gae_advantages(jnp.asarray(m), jnp.asarray(v), jnp.asarray(vn),
                            jnp.asarray(end), 0.99, 0.95)
    a2, r2 = gae_advantages_pallas(jnp.asarray(m), jnp.asarray(v),
                                   jnp.asarray(vn), jnp.asarray(end),
                                   0.99, 0.95, interpret=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6,
                               atol=1e-6)


def test_mlp_bf16_compute_path():
    """Mixed-precision trunk: bf16 matmuls, f32 params and outputs."""
    from fsrl_tpu.nets.mlp import MLP
    m = MLP((64, 64), out_dim=4, compute_dtype=jnp.bfloat16)
    x = jnp.ones((8, 16))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.dtype == jnp.float32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# minibatch_scan remainder semantics + process_rollout 1-pass critic path
# ---------------------------------------------------------------------------

def test_minibatch_scan_nondivisible_drops_randomized():
    """When size % (n_minibatches * tile_size) != 0, minibatch_scan excludes
    the remainder — each sample appears at most once per epoch, and WHICH
    samples are excluded varies with the rng (no systematic starvation)."""
    from fsrl_tpu.types import minibatch_scan
    size, n_mb, tile = 103, 4, 5          # usable = 100, 3 dropped per epoch
    batch = {"x": jnp.arange(size, dtype=jnp.float32)[:, None],
             "y": jnp.arange(size, dtype=jnp.int32)}
    def body(c, mb):
        return c, mb["x"][:, 0].astype(jnp.int32)

    dropped_sets = []
    for seed in range(6):
        _, out = minibatch_scan(jax.random.PRNGKey(seed), batch, n_mb, body,
                                0, tile_size=tile)
        seen = np.sort(np.asarray(out).ravel())
        assert seen.size == (size // tile // n_mb) * n_mb * tile == 100
        assert len(np.unique(seen)) == seen.size          # once per epoch
        dropped_sets.append(frozenset(range(size)) - frozenset(seen.tolist()))
    assert len(set(dropped_sets)) > 1      # excluded tail is re-randomized
    assert frozenset().union(*dropped_sets) != dropped_sets[0]


def test_minibatch_scan_exact_when_divisible():
    from fsrl_tpu.types import minibatch_scan
    size, n_mb, tile = 96, 4, 4
    batch = {"x": jnp.arange(size, dtype=jnp.float32)[:, None]}
    _, out = minibatch_scan(jax.random.PRNGKey(0), batch, n_mb,
                            lambda c, mb: (c, mb["x"][:, 0]), 0,
                            tile_size=tile)
    seen = np.sort(np.asarray(out).ravel())
    np.testing.assert_array_equal(seen, np.arange(size, dtype=np.float32))


def test_process_rollout_one_pass_critic_matches_two_pass():
    """episode_len path (shifted (T+1)-row values + truncation patch) must be
    numerically identical to the reference-style two-pass critic."""
    from fsrl_tpu.algos.common import process_rollout
    from fsrl_tpu.types import Transition

    T, N, D, L = 12, 4, 3, 5
    rng = np.random.RandomState(0)
    # per-column step clocks staggered so truncation hits mid-segment
    clock = (np.arange(T)[:, None] + np.array([0, 1, 2, 4])[None, :])
    truncated = ((clock % L) == L - 1)
    terminated = np.zeros((T, N), bool)
    terminated[3, 1] = True                # early termination resets a column
    # rebuild that column's clock after the termination
    for t in range(4, T):
        clock[t, 1] = clock[t - 1, 1] + 1 if not truncated[t - 1, 1] else 0
    obs = rng.randn(T + 1, N, D).astype(np.float32)
    obs_next = obs[1:].copy()
    done = truncated | terminated
    # at done rows the stored obs_next is the terminal obs, NOT obs[t+1]
    obs_next[done] = rng.randn(int(done.sum()), D).astype(np.float32)

    tr = Transition(
        obs=jnp.asarray(obs[:-1]), act=jnp.zeros((T, N, 2)),
        obs_next=jnp.asarray(obs_next),
        reward=jnp.asarray(rng.randn(T, N).astype(np.float32)),
        cost=jnp.asarray(rng.rand(T, N, 1).astype(np.float32)),
        terminated=jnp.asarray(terminated), truncated=jnp.asarray(truncated),
        logp=jnp.zeros((T, N)),
    )
    W = jnp.asarray(rng.randn(D, 2).astype(np.float32))  # 2-channel critic
    critic = lambda params, o: jnp.tanh(o @ params)

    ref = process_rollout(critic, W, tr, 0.99, 0.95)
    fast = process_rollout(critic, W, tr, 0.99, 0.95, episode_len=L)
    np.testing.assert_allclose(np.asarray(ref.adv), np.asarray(fast.adv),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.ret), np.asarray(fast.ret),
                               rtol=1e-6, atol=1e-6)


def test_minibatch_scan_block_local_shuffle():
    """n_blocks>1: every minibatch draws an equal tile quota from every
    block, rows stay block-major (dp-shardable), and each sample is used at
    most once per epoch."""
    from fsrl_tpu.types import minibatch_scan
    n_blocks, rows_pb, tile, n_mb = 4, 24, 2, 3
    size = n_blocks * rows_pb
    block_of = np.arange(size) // rows_pb
    batch = {"x": jnp.arange(size, dtype=jnp.float32)[:, None]}
    _, out = minibatch_scan(jax.random.PRNGKey(0), batch, n_mb,
                            lambda c, mb: (c, mb["x"][:, 0]), 0,
                            tile_size=tile, n_blocks=n_blocks)
    out = np.asarray(out)                    # (n_mb, rows_per_mb)
    all_rows = out.ravel().astype(int)
    assert len(np.unique(all_rows)) == all_rows.size
    for m in range(n_mb):
        rows = out[m].astype(int)
        blocks = block_of[rows]
        counts = np.bincount(blocks, minlength=n_blocks)
        assert (counts == rows.size // n_blocks).all(), counts
        # block-major inside the minibatch: the sharded axis stays contiguous
        assert (np.sort(blocks) == blocks).all()


# ---------------------------------------------------------------------------
# filtered PID (off-policy controller hardening, benchmarks/diag_sacl.py)

def test_filtered_pid_ema_is_running_mean_then_ema():
    """First `horizon` episodes: exact running mean; after: ~horizon EMA."""
    limits = jnp.array([25.0])
    st = PIDLagrangianState.init(1)
    # 3 collects of 2 episodes each with costs 10, 40, 10: running mean
    costs = [10.0, 40.0, 10.0]
    for c in costs:
        st = filtered_pid_step(st, jnp.array([c]), jnp.asarray(2),
                               limits, 0.05, 0.0005, 0.1, horizon=10.0)
    assert float(st.cost_ema[0]) == pytest.approx(np.mean(costs), rel=1e-5)
    assert float(st.ema_n) == pytest.approx(6.0)
    # once ema_n caps at horizon, one 2-episode collect moves the filter
    # by 2/(10+2) of the innovation
    st = st.replace(ema_n=jnp.asarray(10.0))
    before = float(st.cost_ema[0])
    st = filtered_pid_step(st, jnp.array([100.0]), jnp.asarray(2),
                           limits, 0.05, 0.0005, 0.1, horizon=10.0)
    want = before + (2 / 12) * (100.0 - before)
    assert float(st.cost_ema[0]) == pytest.approx(want, rel=1e-5)


def test_filtered_pid_holds_without_episodes():
    limits = jnp.array([25.0])
    st = filtered_pid_step(PIDLagrangianState.init(1), jnp.array([300.0]),
                           jnp.asarray(2), limits, 0.05, 0.0005, 0.1)
    st2 = filtered_pid_step(st, jnp.array([999.0]), jnp.asarray(0),
                            limits, 0.05, 0.0005, 0.1)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_filtered_pid_integral_is_symmetric():
    """A one-collect spike adds at most +limit to the integral (anti-
    ratchet) while a feasible collect drains up to -limit — the raw
    recurrence instead gains (cost-limit) per spike and was observed to
    ratchet to ~9000 (lambda floor ~4.6) on SafetyBallRun."""
    limits = jnp.array([25.0])
    st = PIDLagrangianState.init(1)
    # huge spike from a policy already at the EMA steady state
    st = st.replace(cost_ema=jnp.array([300.0]), ema_n=jnp.asarray(10.0))
    st = filtered_pid_step(st, jnp.array([300.0]), jnp.asarray(10),
                           limits, 0.0, 1.0, 0.0)
    assert float(st.error_integral[0]) == pytest.approx(25.0)  # clipped
    # feasible collect drains the same amount
    st = st.replace(cost_ema=jnp.array([0.0]))
    st = filtered_pid_step(st, jnp.array([0.0]), jnp.asarray(10),
                           limits, 0.0, 1.0, 0.0)
    assert float(st.error_integral[0]) == pytest.approx(0.0)


def test_filtered_pid_sustained_violation_grows_unbounded():
    """Steady-state authority preserved: a sustained true violation keeps
    growing lambda (the clip only caps the PER-STEP increment)."""
    limits = jnp.array([25.0])
    st = PIDLagrangianState.init(1)
    lam_prev = 0.0
    for _ in range(50):
        st = filtered_pid_step(st, jnp.array([200.0]), jnp.asarray(5),
                               limits, 0.05, 0.0005, 0.1)
    assert float(st.multiplier[0]) > lam_prev
    assert float(st.error_integral[0]) == pytest.approx(
        50 * 25.0, rel=0.05)  # ~+limit per step once EMA converges


def test_pid_controller_step_exact_path_matches_reference():
    """`pid_controller_step(filtered=False)` is the exact reference
    recurrence (ADVICE r4: the reference behavior must stay reachable for
    parity ablations), gated on fresh episodes and tracking the raw
    measurement in cost_ema."""
    from fsrl_tpu.ops.lagrange import pid_controller_step, pid_step
    limits = jnp.array([25.0])
    st = PIDLagrangianState.init(1)
    ref = pid_step(st, jnp.array([40.0]), limits, 0.05, 0.0005, 0.1)
    got = pid_controller_step(st, jnp.array([40.0]), jnp.asarray(3), limits,
                              0.05, 0.0005, 0.1, filtered=False)
    for f in ("error_old", "error_integral", "multiplier"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)))
    assert float(got.cost_ema[0]) == 40.0
    held = pid_controller_step(got, jnp.array([999.0]), jnp.asarray(0),
                               limits, 0.05, 0.0005, 0.1, filtered=False)
    np.testing.assert_allclose(np.asarray(held.multiplier),
                               np.asarray(got.multiplier))


def test_filtered_pid_strict_safety_keeps_integral_authority():
    """cost_limit=0 (strict safety, a legal config) must still accumulate
    integral error — the anti-windup cap is floored at 1.0 (ADVICE r4:
    clip to [0,0] froze I and left only kp/kd authority)."""
    limits = jnp.array([0.0])
    st = PIDLagrangianState.init(1)
    for _ in range(5):
        st = filtered_pid_step(st, jnp.array([3.0]), jnp.asarray(3),
                               limits, 0.0, 0.01, 0.0)
    assert float(st.error_integral[0]) == pytest.approx(5.0)  # +1/step floor
    assert float(st.multiplier[0]) > 0.0
