"""Mini-pyrallis: dataclass-driven CLI.

The reference wraps every train/eval entry point with ``pyrallis.wrap()``
(``examples/mlp/train_ppol_agent.py:65-66``; three override paths — CLI flags,
``--config`` yaml file, dataclass inheritance, ``README.md:167-207``). pyrallis
is not in this image, so this module provides the same surface: flags are
auto-generated from dataclass fields, ``--config file.yaml`` merges file values
(CLI flags win), and the final config serializes back to yaml next to
checkpoints for exact eval-time rebuild.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
from typing import Any, Callable, Type, get_args, get_origin

import yaml


def _parse_value(ftype, raw: str):
    origin = get_origin(ftype)
    if ftype is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    if ftype in (int, float, str):
        return ftype(raw)
    if origin in (tuple, list):
        args = get_args(ftype)
        elem = args[0] if args else float
        if elem is Ellipsis:
            elem = float
        vals = [v for v in raw.replace("[", "").replace("]", "")
                .replace("(", "").replace(")", "").split(",") if v.strip()]
        seq = [(_parse_value(elem, v.strip())) for v in vals]
        return tuple(seq) if origin is tuple else seq
    if ftype is Any or ftype is None:
        return yaml.safe_load(raw)
    try:
        return yaml.safe_load(raw)
    except Exception:
        return raw


def parse_config(cfg_cls: Type, argv: list[str] | None = None):
    """Build a cfg_cls instance from --config yaml + per-field CLI flags."""
    import typing
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser(
        description=f"{cfg_cls.__name__} (auto-generated flags)")
    parser.add_argument("--config", type=str, default=None,
                        help="yaml file with field overrides")
    # resolve string annotations (`from __future__ import annotations` makes
    # dataclass field .type a string) to real types; unwrap Optional[X]
    hints = typing.get_type_hints(cfg_cls)
    ftypes: dict[str, Any] = {}
    for f in dataclasses.fields(cfg_cls):
        ftype = hints.get(f.name, f.type)
        if get_origin(ftype) is typing.Union:
            args = [a for a in get_args(ftype) if a is not type(None)]
            if len(args) == 1:
                ftype = args[0]
        ftypes[f.name] = ftype
        parser.add_argument(f"--{f.name}", type=str, default=None,
                            help=f"type {getattr(ftype, '__name__', ftype)}")
    ns = parser.parse_args(argv)

    values: dict[str, Any] = {}
    if ns.config:
        with open(ns.config) as fh:
            file_vals = yaml.safe_load(fh) or {}
        for k, v in file_vals.items():
            if k in ftypes:
                if isinstance(v, list) and get_origin(ftypes[k]) is tuple:
                    v = tuple(v)
                values[k] = v
    for name, ftype in ftypes.items():
        raw = getattr(ns, name)
        if raw is not None:
            values[name] = _parse_value(ftype, raw)
    return cfg_cls(**values)


def cli(cfg_cls: Type) -> Callable:
    """Decorator: ``@cli(TrainCfg)\ndef main(cfg): ...`` — pyrallis.wrap()
    equivalent."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(argv: list[str] | None = None):
            return fn(parse_config(cfg_cls, argv))

        return wrapper

    return deco


def asdict(cfg) -> dict:
    """Recursively convert a (possibly nested) config dataclass to a dict."""
    return dataclasses.asdict(cfg)
