"""Checkpoint round-trip, config CLI, and auto-naming tests."""

import dataclasses
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
