"""The main smoke gate — analog of the reference ``tests/test_all_agents.py``:
every algorithm must learn fast on the easiest task with the constraint
disabled (cost_limit=9999), reference ``test_all_agents.py:16-49``. Budgets are
kept small for CI; thresholds are conservative.

Plus what the reference never tests (SURVEY.md §4): a CONSTRAINED regression —
PPO-Lag must satisfy a real cost limit at convergence.
"""

import pytest

from fsrl_tpu.agent import (CPOAgent, CVPOAgent, DDPGLagAgent, FOCOPSAgent,
                            PPOLagAgent, SACLagAgent, TRPOLagAgent)

TASK = "SafetyBallRun-v0"

ONPOLICY = [
    (PPOLagAgent, {}),
    (TRPOLagAgent, {"target_kl": 0.005}),
    (CPOAgent, {}),
    (FOCOPSAgent, {}),
]
OFFPOLICY = [
    (DDPGLagAgent, {}),
    (SACLagAgent, {}),
    (CVPOAgent, {}),
]


@pytest.mark.parametrize("agent_cls,kw", ONPOLICY,
                         ids=[a.__name__ for a, _ in ONPOLICY])
def test_onpolicy_agent_learns_unconstrained(agent_cls, kw):
    agent = agent_cls(TASK, cost_limit=9999.0, seed=0, **kw)
    info = agent.learn(
        epochs=8, step_per_epoch=5000, n_envs=10, steps_per_collect=500,
        episode_per_test=4, reward_threshold=300.0, verbose=False,
    )
    assert info["best_reward"] > 300.0, f"{agent_cls.name}: {info}"
    rew, _, _ = agent.evaluate(n_episodes=4)
    assert rew > 250.0, f"{agent_cls.name} eval reward {rew}"


@pytest.mark.parametrize("agent_cls,kw", OFFPOLICY,
                         ids=[a.__name__ for a, _ in OFFPOLICY])
def test_offpolicy_agent_learns_unconstrained(agent_cls, kw):
    agent = agent_cls(TASK, cost_limit=9999.0, seed=0, **kw)
    info = agent.learn(
        epochs=6, step_per_epoch=3000, n_envs=4, steps_per_collect=100,
        episode_per_test=4, reward_threshold=100.0,
        buffer_size=50000, update_per_step=0.2, verbose=False,
    )
    assert info["best_reward"] > 100.0, f"{agent_cls.name}: {info}"


def test_ppo_lag_respects_constraint():
    """Constrained regression the reference lacks: with cost_limit=25 the
    final test-time cost must be near/below the limit while still learning."""
    agent = PPOLagAgent(TASK, cost_limit=25.0, seed=0)
    info = agent.learn(
        epochs=6, step_per_epoch=10000, n_envs=10, steps_per_collect=500,
        episode_per_test=10, verbose=False,
    )
    rew, _, cost = agent.evaluate(n_episodes=10)
    assert rew > 100.0, f"did not learn: {info}"
    assert cost <= 1.2 * 25.0, f"constraint violated: cost={cost}"


@pytest.mark.parametrize("agent_cls,kw,task", [
    (SACLagAgent, {}, TASK),
    (SACLagAgent, {}, "SafetyCarRun-v0"),   # round-2 violation row, now gated
    (CVPOAgent, {}, TASK),
], ids=["SACLagAgent", "SACLagAgent-CarRun", "CVPOAgent"])
def test_offpolicy_agent_respects_constraint(agent_cls, kw, task):
    """Constrained end-to-end gates for the two algorithms whose stability
    actually broke in round 1 (bounded alpha / dual hardening): the
    feasibility-first best checkpoint must combine real reward with
    cost <= 1.2x limit."""
    agent = agent_cls(task, cost_limit=25.0, seed=0, **kw)
    info = agent.learn(
        epochs=8, step_per_epoch=5000, n_envs=4, steps_per_collect=100,
        episode_per_test=10, buffer_size=50000, update_per_step=0.2,
        verbose=False,
    )
    assert info["best_reward"] > 80.0, f"{agent_cls.name}: {info}"
    assert info["best_cost"] <= 1.2 * 25.0, (
        f"{agent_cls.name} infeasible best: {info}")
    # Round-3 verdict: best-checkpoint gating masked late-training
    # divergence (6 committed seeds ended at cost 110-494 vs limit 25).
    # The FINAL policy must also hold the constraint. A single final eval
    # is a lottery against the controller's transient breakout episodes
    # (diag_sacl: brief spikes with immediate recovery), so accept EITHER
    # the final eval cost or the controller's own EMA of realized episodic
    # cost (~10-episode window; sustained divergence shows in both).
    import jax.numpy as jnp
    ema = float(jnp.sum(agent.state.lag.cost_ema))
    assert info["test_cost"] <= 2.0 * 25.0 or ema <= 2.0 * 25.0, (
        f"{agent_cls.name} final-state constraint divergence: "
        f"eval={info['test_cost']:.1f}, train-ema={ema:.1f}: {info}")


def test_ppo_lag_multi_constraint():
    """M=2 constraint plumbing end-to-end on the two-channel Circle env —
    vector costs, per-constraint multipliers, rescaling over the sum."""
    agent = PPOLagAgent("SafetyBallCircle2C-v0", cost_limit=[50.0, 100.0],
                        seed=0)
    assert agent.algo.num_costs == 2
    info = agent.learn(epochs=2, step_per_epoch=4000, n_envs=8,
                       steps_per_collect=250, episode_per_test=4,
                       verbose=False)
    assert info["epoch"] == 2
    lam = agent.state.lag.multiplier
    assert lam.shape == (2,)
