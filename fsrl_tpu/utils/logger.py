"""Metric logging subsystem.

API-compatible re-design of the reference logger family
(``fsrl/utils/logger/base_logger.py``, ``tb_logger.py``, ``wandb_logger.py``):
a running-average registry with tab-prefixed keys (``train/``, ``test/``,
``loss/``, ``update/``), epoch-end ``write`` (tabular print + progress.txt TSV +
reset) and streaming ``write_without_reset``, checkpoint hooks, and a yaml
config snapshot for exact eval-time rebuild.
"""

from __future__ import annotations

import atexit
import os
import os.path as osp
import time
from abc import ABC
from typing import Any, Callable, Iterable, Optional

import numpy as np
import yaml


class RunningAverage:
    """Mergeable Welford running average (reference ``logger_util.py:59-109``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.n, self.mean, self.M2 = 0, 0.0, 0.0

    def add(self, x: float):
        self.n += 1
        d = x - self.mean
        self.mean += d / self.n
        self.M2 += d * (x - self.mean)

    @property
    def std(self) -> float:
        return float(np.sqrt(self.M2 / self.n)) if self.n > 1 else 0.0

    def __add__(self, other: "RunningAverage") -> "RunningAverage":
        out = RunningAverage()
        n = self.n + other.n
        if n:
            delta = other.mean - self.mean
            out.n = n
            out.mean = self.mean + delta * other.n / n
            out.M2 = self.M2 + other.M2 + delta**2 * self.n * other.n / n
        return out


def colorize(string: str, color: str = "green", bold: bool = False) -> str:
    """ANSI-colorize a string — reference ``logger_util.colorize``."""
    colors = dict(gray=30, red=31, green=32, yellow=33, blue=34, magenta=35,
                  cyan=36, white=37)
    attr = [str(colors.get(color, 32))] + (["1"] if bold else [])
    return f"\x1b[{';'.join(attr)}m{string}\x1b[0m"


class BaseLogger(ABC):
    """Registry + text sinks. Subclasses add TB / wandb streaming."""

    def __init__(self, log_dir: Optional[str] = None, log_txt: bool = True,
                 name: Optional[str] = None):
        self.name = name
        self.log_dir = osp.join(log_dir, name) if log_dir and name else log_dir
        self.log_fname = "progress.txt"
        if self.log_dir:
            os.makedirs(osp.join(self.log_dir, "checkpoint"), exist_ok=True)
        self.output_file = None
        if log_txt and self.log_dir:
            self.output_file = open(osp.join(self.log_dir, self.log_fname), "w")
            atexit.register(self.output_file.close)
        self.first_row = True
        self.stats: dict[str, RunningAverage] = {}
        self.logged_keys: set[str] = set()
        self.checkpoint_fn: Optional[Callable[[str | None], Any]] = None
        self.start_time = time.time()

    # --- registry ---
    def store(self, tab: Optional[str] = None, **kwargs) -> None:
        for k, v in kwargs.items():
            key = f"{tab}/{k}" if tab else k
            self.stats.setdefault(key, RunningAverage()).add(float(v))
            self.logged_keys.add(key)

    def get_mean(self, key: str) -> float:
        ra = self.stats.get(key)
        return ra.mean if ra and ra.n else 0.0

    def stats_mean(self) -> dict[str, float]:
        return {k: v.mean for k, v in self.stats.items() if v.n}

    def reset(self) -> None:
        for v in self.stats.values():
            v.reset()

    # --- sinks ---
    def write(self, step: int, display: bool = True,
              display_keys: Optional[Iterable[str]] = None) -> None:
        row = dict(self.stats_mean())
        row["update/env_step"] = step
        self._stream(row, step)
        if self.output_file is not None:
            keys = sorted(row)
            if self.first_row:
                self.output_file.write("\t".join(keys) + "\n")
                self.first_row = False
            self.output_file.write(
                "\t".join(str(row.get(k, "")) for k in keys) + "\n")
            self.output_file.flush()
        if display:
            self.display_tabular(row, display_keys)
        self.reset()

    def write_without_reset(self, step: int) -> None:
        self._stream(self.stats_mean(), step)

    def _stream(self, row: dict[str, float], step: int) -> None:
        pass  # TB / wandb subclasses

    def display_tabular(self, row: dict[str, float],
                        display_keys: Optional[Iterable[str]] = None) -> None:
        keys = sorted(display_keys or row)
        width = max((len(k) for k in keys), default=8)
        line = "-" * (width + 20)
        print(line)
        for k in keys:
            v = row.get(k, 0.0)
            vs = f"{v:8.4g}" if isinstance(v, float) else str(v)
            print(f"| {k:<{width}} | {vs:>14} |")
        print(line, flush=True)

    def print(self, msg: str, color: str = "green") -> None:
        print(colorize(msg, color, bold=True))

    # --- checkpointing hooks (reference base_logger.py:114-130) ---
    def setup_checkpoint_fn(self, fn: Callable[[str | None], Any]) -> None:
        self.checkpoint_fn = fn

    def save_checkpoint(self, suffix: Optional[str] = None) -> None:
        if self.checkpoint_fn:
            self.checkpoint_fn(suffix)

    def save_config(self, config: dict, verbose: bool = False) -> None:
        if self.log_dir:
            with open(osp.join(self.log_dir, "config.yaml"), "w") as f:
                yaml.safe_dump(_plain(config), f, default_flow_style=False)
        if verbose:
            self.print(f"config: {config}")

    def restore_data(self) -> tuple[int, int, int]:
        """(epoch, env_step, gradient_step) for resume; 0s if nothing."""
        return 0, 0, 0


class DummyLogger(BaseLogger):
    """No-op variant (reference ``base_logger.py:241-292``)."""

    def __init__(self):
        super().__init__(log_dir=None, log_txt=False)

    def store(self, tab=None, **kwargs):
        pass

    def write(self, step, display=True, display_keys=None):
        pass

    def write_without_reset(self, step):
        pass

    def display_tabular(self, row, display_keys=None):
        pass

    def print(self, msg, color="green"):
        pass


class TensorboardLogger(BaseLogger):
    """tensorboardX sink + step-counter recovery (``tb_logger.py``)."""

    def __init__(self, log_dir: str, log_txt: bool = True,
                 name: Optional[str] = None):
        super().__init__(log_dir, log_txt, name)
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(self.log_dir)

    def _stream(self, row: dict[str, float], step: int) -> None:
        for k, v in row.items():
            self.writer.add_scalar(k, v, global_step=step)
        self.writer.flush()

    def restore_data(self) -> tuple[int, int, int]:
        """Recover (epoch, env_step, gradient_step) from the event files —
        the reference's resume hook (``tb_logger.py:50-73``). The trainer
        logs all three as scalar values under the ``update/`` tab."""
        try:
            from tensorboard.backend.event_processing import event_accumulator
            ea = event_accumulator.EventAccumulator(self.log_dir)
            ea.Reload()
            def last_value(tag):
                try:
                    return int(ea.Scalars(tag)[-1].value)
                except Exception:
                    return 0
            return (last_value("update/epoch"),
                    last_value("update/env_step"),
                    last_value("update/gradient_step"))
        except Exception:
            return 0, 0, 0


class WandbLogger(BaseLogger):
    """wandb sink (``wandb_logger.py``). Degrades to text-only when the wandb
    package is unavailable in the image."""

    def __init__(self, log_dir: str, log_txt: bool = True,
                 name: Optional[str] = None, project: str = "fsrl-tpu",
                 group: Optional[str] = None):
        super().__init__(log_dir, log_txt, name)
        try:
            import wandb
            self.wandb_run = wandb.init(
                project=project, group=group, name=name, dir=log_dir,
                resume="allow",
            ) if wandb.run is None else wandb.run
        except Exception:
            self.wandb_run = None

    def _stream(self, row: dict[str, float], step: int) -> None:
        if self.wandb_run is not None:
            self.wandb_run.log(row, step=step)

    def save_config(self, config: dict, verbose: bool = False) -> None:
        super().save_config(config, verbose)
        if self.wandb_run is not None:
            self.wandb_run.config.update(_plain(config), allow_val_change=True)


def _plain(obj: Any) -> Any:
    """Recursively convert dataclasses/np scalars for yaml."""
    import dataclasses
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _plain(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    return obj
