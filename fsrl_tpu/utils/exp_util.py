"""Experiment utilities: seeding, auto-naming, eval-time reload
(reference ``fsrl/utils/exp_util.py``)."""

from __future__ import annotations

import dataclasses
import os.path as osp
import random
import uuid
from typing import Tuple

import numpy as np
import yaml


def seed_all(seed: int = 1029) -> None:
    """Python/numpy seeding (reference ``seed_all``, exp_util.py:16-40; the
    torch/cudnn parts have no analog — JAX determinism comes from explicit
    PRNG keys threaded through every function)."""
    random.seed(seed)
    np.random.seed(seed)


# abbreviation scheme mirroring the reference's (exp_util.py:112-169)
DEFAULT_SKIP_KEYS = {
    "task", "logdir", "project", "group", "name", "prefix", "suffix",
    "verbose", "use_default_cfg", "save_interval", "episode_per_test",
    "reward_threshold", "use_mesh",
}


def _abbr(name: str) -> str:
    parts = name.split("_")
    return "_".join(p[:4] for p in parts)


def auto_name(default_cfg, cfg, prefix: str = "", suffix: str = "",
              skip_keys=DEFAULT_SKIP_KEYS) -> str:
    """Experiment name = diff(cfg, default_cfg) with abbreviations + short
    uuid, exactly the reference naming scheme (exp_util.py:131-169)."""
    d0 = dataclasses.asdict(default_cfg)
    d1 = dataclasses.asdict(cfg)
    diffs = []
    for k in sorted(d1):
        if k in skip_keys:
            continue
        if d0.get(k) != d1[k]:
            v = d1[k]
            vs = str(v).replace(" ", "")
            diffs.append(f"{_abbr(k)}{vs}")
    name = "-".join([p for p in ([prefix] + diffs) if p])
    token = uuid.uuid4().hex[:4]
    name = f"{name}-{token}" if name else token
    if suffix:
        name = f"{name}-{suffix}"
    return name


def load_config_and_model(path: str, best: bool = False,
                          target=None) -> Tuple[dict, object]:
    """Reload ``config.yaml`` + checkpoint from a run directory (reference
    ``load_config_and_model``, exp_util.py:60-84)."""
    from fsrl_tpu.utils.checkpoint import load_checkpoint
    cfg_path = osp.join(path, "config.yaml")
    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    name = "model_best" if best else "model"
    model_path = osp.join(path, "checkpoint", name)
    state = load_checkpoint(model_path, target)
    return config, state
