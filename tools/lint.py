#!/usr/bin/env python
"""Enforcing stdlib lint gate (the image ships no flake8/ruff; the reference
gates CI on flake8+bugbear, reference makefile:20-34, so this reimplements the
high-value subset with ast + tokenize and EXITS NONZERO on findings).

Checks:
  E501  line longer than --max-line-length (default 100)
  W291  trailing whitespace
  W191  tab indentation
  F401  imported name never used (per module; ``__init__.py`` re-exports and
        names listed in ``__all__`` are exempt)
  F811  duplicate top-level definition
  E722  bare ``except:``
  F632  ``is`` comparison with a str/int literal

Usage: python tools/lint.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LEN = 100


def iter_py(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class UseCollector(ast.NodeVisitor):
    """Record every Name/Attribute-root identifier that is read."""

    def __init__(self):
        self.used: set[str] = set()

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path) -> list[str]:
    errs = []
    rel = str(path)
    try:
        src = path.read_text()
    except UnicodeDecodeError:
        return [f"{rel}:1: E902 cannot decode file"]

    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LEN:
            errs.append(f"{rel}:{i}: E501 line too long ({len(line)})")
        if line != line.rstrip():
            errs.append(f"{rel}:{i}: W291 trailing whitespace")
        stripped_prefix = line[:len(line) - len(line.lstrip())]
        if "\t" in stripped_prefix:
            errs.append(f"{rel}:{i}: W191 tab indentation")

    try:
        tree = ast.parse(src, filename=rel)
    except SyntaxError as e:
        return errs + [f"{rel}:{e.lineno}: E999 syntax error: {e.msg}"]

    # F401 unused imports (skip __init__.py: re-export surface)
    if path.name != "__init__.py":
        imported: dict[str, int] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    imported.setdefault(name, node.lineno)
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    imported.setdefault(a.asname or a.name, node.lineno)
        uses = UseCollector()
        uses.visit(tree)
        exported = set()
        for node in ast.walk(tree):
            if (isinstance(node, ast.Assign) and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "__all__"
                    and isinstance(node.value, (ast.List, ast.Tuple))):
                exported = {e.value for e in node.value.elts
                            if isinstance(e, ast.Constant)}
        # a bare string expression (docstring elsewhere) can reference a name
        # for doctest purposes; don't chase that — imports used only in
        # annotations under `from __future__ import annotations` still parse
        # as Name nodes, so they count as uses.
        for name, lineno in imported.items():
            if name not in uses.used and name not in exported:
                errs.append(f"{rel}:{lineno}: F401 '{name}' imported but "
                            "unused")

    # F811 duplicate top-level def/class
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                errs.append(f"{rel}:{node.lineno}: F811 redefinition of "
                            f"'{node.name}' (line {seen[node.name]})")
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errs.append(f"{rel}:{node.lineno}: E722 bare 'except:'")
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Is, ast.IsNot))
                        and isinstance(cmp_, ast.Constant)
                        and isinstance(cmp_.value, (str, int))
                        and not isinstance(cmp_.value, bool)):
                    errs.append(f"{rel}:{node.lineno}: F632 'is' comparison "
                                "with literal")
    return errs


def filter_noqa(path: Path, errs: list[str]) -> list[str]:
    """Drop findings whose source line carries a ``# noqa`` marker."""
    lines = path.read_text().splitlines()
    out = []
    for e in errs:
        try:
            lineno = int(e.split(":", 2)[1])
            if "# noqa" in lines[lineno - 1]:
                continue
        except (IndexError, ValueError):
            pass
        out.append(e)
    return out


def main(argv):
    paths = argv[1:] or ["fsrl_tpu", "tests", "benchmarks", "tools"]
    all_errs = []
    n_files = 0
    for f in iter_py(paths):
        n_files += 1
        all_errs.extend(filter_noqa(f, check_file(f)))
    for e in all_errs:
        print(e)
    print(f"lint: {n_files} files, {len(all_errs)} findings")
    return 1 if all_errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
