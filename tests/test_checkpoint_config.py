"""Checkpoint round-trip, config CLI, and auto-naming tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.config.cli import parse_config
from fsrl_tpu.config.configs import PPOLagCfg, apply_task_preset
from fsrl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from fsrl_tpu.utils.exp_util import auto_name


def test_checkpoint_roundtrip_exact(tmp_path):
    algo = PPOLag(5, 2, cost_limit=10.0)
    state = algo.init(jax.random.PRNGKey(0))
    # advance the PID state so non-default values are exercised
    state = state.replace(lag=state.lag.replace(
        multiplier=jnp.array([3.5]), error_integral=jnp.array([7.0])))
    path = os.path.join(tmp_path, "ck")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, algo.init(jax.random.PRNGKey(1)))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.lag.multiplier[0]) == 3.5


def test_checkpoint_structure_mismatch_raises(tmp_path):
    algo = PPOLag(5, 2)
    state = algo.init(jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "ck")
    save_checkpoint(path, state)
    other = PPOLag(7, 3).init(jax.random.PRNGKey(0))
    with pytest.raises(Exception):
        r = load_checkpoint(path, other)
        # shape mismatch must not silently succeed
        jax.block_until_ready(jax.tree.leaves(r)[0])
        s = jax.tree.leaves(r.params["actor"])[0]
        t = jax.tree.leaves(other.params["actor"])[0]
        assert s.shape == t.shape
        raise AssertionError("restore silently accepted wrong shapes")


def test_cli_flag_parsing():
    cfg = parse_config(PPOLagCfg, [
        "--task", "SafetyBallRun-v0", "--cost_limit", "25",
        "--lagrangian_pid", "0.1,0.001,0.2", "--use_lagrangian", "false",
        "--epochs", "7",
    ])
    assert cfg.task == "SafetyBallRun-v0"
    assert cfg.cost_limit == 25.0
    assert cfg.lagrangian_pid == (0.1, 0.001, 0.2)
    assert cfg.use_lagrangian is False
    assert cfg.epochs == 7


def test_cli_yaml_with_flag_override(tmp_path):
    import yaml
    p = os.path.join(tmp_path, "cfg.yaml")
    with open(p, "w") as f:
        yaml.safe_dump({"cost_limit": 50.0, "epochs": 11}, f)
    cfg = parse_config(PPOLagCfg, ["--config", p, "--epochs", "3"])
    assert cfg.cost_limit == 50.0   # from yaml
    assert cfg.epochs == 3          # CLI wins


def test_auto_name_diffs_only():
    d, c = PPOLagCfg(), PPOLagCfg(cost_limit=25.0, lr=1e-3)
    name = auto_name(d, c, prefix="ppol")
    assert name.startswith("ppol-")
    assert "cost_limi25" in name.replace(".0", "")
    assert "lr0.001" in name
    assert "task" not in name  # skip-listed


def test_task_presets():
    cfg = PPOLagCfg(task="SafetyBallRun-v0")
    cfg = apply_task_preset(cfg)
    assert cfg.epochs * cfg.step_per_epoch == 1_000_000
    cfg2 = apply_task_preset(PPOLagCfg(task="SafetyCarCircle-v0"))
    assert cfg2.epochs == 200  # default 2M budget untouched


def test_trainer_resume_from(tmp_path):
    """resume_from restores the full TrainState into a fresh trainer."""
    import os
    from fsrl_tpu.agent import PPOLagAgent
    from fsrl_tpu.trainer.trainer import OnpolicyTrainerTPU
    from fsrl_tpu.utils.checkpoint import save_checkpoint

    agent = PPOLagAgent("SafetyBallRun-v0", cost_limit=25.0, seed=0)
    agent.learn(epochs=1, step_per_epoch=2000, n_envs=4,
                steps_per_collect=250, episode_per_test=2, verbose=False)
    ck = os.path.join(tmp_path, "ck")
    save_checkpoint(ck, agent.state)
    trained_count = int(agent.state.update_count)
    assert trained_count > 0

    t2 = OnpolicyTrainerTPU(agent.algo, agent.env, cost_limit=25.0, epochs=1,
                            step_per_epoch=1000, n_envs=4,
                            steps_per_collect=250, episode_per_test=2,
                            verbose=False, resume_from=ck)
    assert int(t2.state.update_count) == trained_count


def test_runtime_cost_limit_override():
    """Every algorithm accepts a runtime cost limit without retracing."""
    import jax.numpy as jnp
    from fsrl_tpu.algos import CPO, FOCOPS, PPOLag, TRPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    env = make("SafetyBallRun-v0")
    rollout = jax.jit(make_rollout_fn(
        env, lambda p, o, r: (jax.random.uniform(r, o.shape[:-1] + (2,),
                                                 minval=-1, maxval=1),
                              jnp.zeros(o.shape[:-1])), 32))
    res = rollout({}, env.reset_vec(jax.random.PRNGKey(0), 4),
                  EpisodeStats.init(4, 1), jax.random.PRNGKey(1))
    for cls in (PPOLag, TRPOLag, CPO, FOCOPS):
        algo = cls(env.observation_size, env.action_size, cost_limit=10.0)
        st0 = algo.init(jax.random.PRNGKey(0))
        upd = jax.jit(algo.update)
        outs = {}
        for lim in (0.001, 10000.0):
            arr = jnp.asarray([lim]) if cls is not CPO else jnp.asarray(lim)
            st, m = upd(st0, res.transitions,
                        jnp.asarray([5.0]),      # synthetic mean episodic cost
                        jnp.asarray(1, jnp.int32), jax.random.PRNGKey(2),
                        cost_limit=arr)
            outs[lim] = (st, m)
        if cls in (PPOLag, TRPOLag):
            # tight limit must engage the multiplier; loose must not
            assert float(outs[0.001][0].lag.multiplier[0]) > 0.0
            assert float(outs[10000.0][0].lag.multiplier[0]) == 0.0
        if cls is FOCOPS:
            assert float(outs[0.001][0].nu) > float(outs[10000.0][0].nu)
        if cls is CPO:
            # infeasible under the tight limit (case<=1), feasible under loose
            assert float(outs[0.001][1]["loss/optim_C"]) > 0
            assert float(outs[10000.0][1]["loss/optim_C"]) < 0


def test_checkpoint_migration_fills_missing_fields(tmp_path):
    """Checkpoints written before a TrainState grew fields (e.g. round-3
    predates PIDLagrangianState.cost_ema/ema_n) restore with the new fields
    zero-filled from the target (ADVICE r4 migration shim)."""
    from flax.serialization import to_state_dict
    import orbax.checkpoint as ocp

    algo = PPOLag(5, 2, cost_limit=10.0)
    state = algo.init(jax.random.PRNGKey(0))
    state = state.replace(lag=state.lag.replace(multiplier=jnp.array([3.5])))
    # simulate an old-structure checkpoint: drop the new filter fields
    sd = to_state_dict(jax.device_get(state))
    del sd["lag"]["cost_ema"], sd["lag"]["ema_n"]
    path = os.path.join(tmp_path, "old_ck")
    ocp.PyTreeCheckpointer().save(path, sd, force=True)

    restored = load_checkpoint(path, algo.init(jax.random.PRNGKey(1)))
    assert float(restored.lag.multiplier[0]) == 3.5
    np.testing.assert_array_equal(np.asarray(restored.lag.cost_ema),
                                  np.zeros(1))


def test_task_registry_covers_every_shipped_task():
    """Every registered env id (plus the velocity suite) has a preset row —
    the reference's 30-name TASK_TO_CFG (train_ppol_agent.py:29-62)."""
    from fsrl_tpu.config.configs import TASK_ALIASES, TASK_TO_PRESET
    from fsrl_tpu.envs import registered_tasks
    from fsrl_tpu.envs.velocity import VELOCITY_LIMITS
    for t in list(registered_tasks()) + list(VELOCITY_LIMITS):
        assert t in TASK_TO_PRESET, f"no preset row for shipped task {t}"
    assert len(TASK_TO_PRESET) >= 30
    # reference-style ids resolve through the alias table
    cfg = apply_task_preset(PPOLagCfg(task="SafetyAntVelocityGymnasium-v1"))
    assert cfg.task == "SafetyAntVelocity-v1"
    assert cfg.epochs * cfg.step_per_epoch == 10_000_000
    assert "SafetyHumanoidVelocityGymnasium-v1" in TASK_ALIASES
