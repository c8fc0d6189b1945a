"""Static documentation-site builder: API autodoc + tutorial pages.

The reference ships a sphinx site with API autodoc, tutorials, and
doc-build/style gates (``/root/reference/docs/conf.py``, ``docs/api/``,
``makefile:36-62``). This environment has no sphinx, so this is a
self-contained equivalent on the stdlib + ``markdown``:

1. **Autodoc**: imports every ``fsrl_tpu`` module, walks public classes/
   functions with ``inspect``, and emits one API page per module
   (signatures + docstrings, Args/Returns sections preserved verbatim).
2. **Tutorials**: renders the hand-written ``docs/*.md`` pages.
3. **Docstring-coverage gate** (the pydocstyle/doc8 analog): the build
   FAILS if any public module, class, or function in the package lacks a
   docstring — run by ``make docs`` and CI.

Usage:
    python tools/build_docs.py           # build docs/_build/html
    python tools/build_docs.py --check   # coverage gate only (no output)
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import os
import pkgutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title} — fsrl_tpu</title>
<style>
body {{ font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       display: flex; color: #1a1a1a; }}
nav {{ width: 250px; min-height: 100vh; background: #f4f4f6; padding: 1rem;
      border-right: 1px solid #ddd; flex-shrink: 0; }}
nav h3 {{ margin: 0.8rem 0 0.3rem; font-size: 0.8rem; text-transform: uppercase;
         color: #666; }}
nav a {{ display: block; padding: 2px 6px; color: #205080; text-decoration: none;
        font-size: 0.9rem; border-radius: 4px; }}
nav a:hover {{ background: #e2e6ee; }}
main {{ max-width: 60rem; padding: 2rem 3rem; overflow-x: auto; }}
pre {{ background: #f6f8fa; padding: 0.8rem; border-radius: 6px;
      overflow-x: auto; font-size: 0.85rem; }}
code {{ background: #f0f1f3; padding: 0.1em 0.3em; border-radius: 3px;
       font-size: 0.9em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: 4px 10px; font-size: 0.9rem; }}
h1, h2 {{ border-bottom: 1px solid #eee; padding-bottom: 0.2em; }}
.sig {{ background: #eef3f8; border-left: 3px solid #4078c0; padding: 0.5rem;
       font-family: monospace; font-size: 0.9rem; white-space: pre-wrap; }}
</style></head>
<body><nav><h2><a href="index.html" style="font-size:1.1rem">fsrl_tpu</a></h2>
{nav}</nav><main>{body}</main></body></html>
"""


def list_modules():
    import fsrl_tpu
    mods = []
    for info in pkgutil.walk_packages(fsrl_tpu.__path__, "fsrl_tpu."):
        if any(part.startswith("_") for part in info.name.split(".")):
            continue
        spec = importlib.util.find_spec(info.name)
        # ctypes-loaded shared objects (e.g. native/libgridfilter.so) are
        # not Python modules
        if spec is None or not str(spec.origin).endswith(".py"):
            continue
        mods.append(info.name)
    return ["fsrl_tpu"] + sorted(mods)


def public_members(mod):
    """Classes and functions defined in (not imported into) the module."""
    out = []
    for name, obj in inspect.getmembers(mod):
        if name.startswith("_"):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        out.append((name, obj))
    return out


def doc_of(obj) -> str:
    return inspect.getdoc(obj) or ""


def sig_of(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def autodoc_markdown(mod_name: str, missing: list) -> str:
    mod = importlib.import_module(mod_name)
    lines = [f"# `{mod_name}`", ""]
    mdoc = doc_of(mod)
    if mdoc:
        lines += [mdoc, ""]
    else:
        missing.append(mod_name)
    for name, obj in public_members(mod):
        qual = f"{mod_name}.{name}"
        if inspect.isclass(obj):
            lines += [f"## class `{name}`", "",
                      f'<div class="sig">class {name}{sig_of(obj)}</div>', ""]
            cdoc = doc_of(obj)
            if cdoc:
                lines += [cdoc, ""]
            elif not _is_exempt(obj):
                missing.append(qual)
            for mname, meth in inspect.getmembers(obj, inspect.isfunction):
                if mname.startswith("_") or meth.__qualname__.split(".")[0] != name:
                    continue
                lines += [f"### `{name}.{mname}`", "",
                          f'<div class="sig">{mname}{sig_of(meth)}</div>', ""]
                d = doc_of(meth)
                if d:
                    lines += [d, ""]
        else:
            lines += [f"## `{name}`", "",
                      f'<div class="sig">{name}{sig_of(obj)}</div>', ""]
            fdoc = doc_of(obj)
            if fdoc:
                lines += [fdoc, ""]
            else:
                missing.append(qual)
    return "\n".join(lines)


def _is_exempt(cls) -> bool:
    # flax struct dataclasses are state containers; field docs live in the
    # module docstring
    return hasattr(cls, "__dataclass_fields__")


def build(check_only: bool = False) -> int:
    import markdown as md

    mods = list_modules()
    missing: list = []
    api_pages = {}
    for m in mods:
        try:
            api_pages[m] = autodoc_markdown(m, missing)
        except Exception as e:  # import failure is a build failure
            print(f"FAIL: cannot import {m}: {e}")
            return 1

    if missing:
        print("Docstring-coverage gate FAILED — public symbols without "
              "docstrings:")
        for q in missing:
            print(f"  {q}")
        return 1
    print(f"docstring coverage: OK ({len(mods)} modules)")
    if check_only:
        return 0

    docs_dir = os.path.join(REPO, "docs")
    out = os.path.join(docs_dir, "_build", "html")
    os.makedirs(out, exist_ok=True)
    tutorials = sorted(f for f in os.listdir(docs_dir) if f.endswith(".md"))

    nav = ["<h3>Tutorials</h3>"]
    nav += [f'<a href="{f[:-3]}.html">{f[:-3].replace("_", " ")}</a>'
            for f in tutorials]
    nav += ["<h3>API</h3>"]
    nav += [f'<a href="api_{m.replace(".", "_")}.html">{m}</a>' for m in mods]
    nav_html = "\n".join(nav)

    def render(title, text, fname):
        body = md.markdown(text, extensions=["fenced_code", "tables",
                                             "codehilite"])
        with open(os.path.join(out, fname), "w") as f:
            f.write(PAGE.format(title=title, nav=nav_html, body=body))

    for f in tutorials:
        render(f[:-3], open(os.path.join(docs_dir, f)).read(),
               f"{f[:-3]}.html")
    for m, text in api_pages.items():
        render(m, text, f"api_{m.replace('.', '_')}.html")

    readme = open(os.path.join(REPO, "README.md")).read()
    render("fsrl_tpu", readme, "index.html")
    print(f"built {len(tutorials) + len(api_pages) + 1} pages -> {out}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true",
                   help="docstring-coverage gate only")
    args = p.parse_args()
    sys.exit(build(check_only=args.check))
