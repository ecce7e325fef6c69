"""Content-hash gate state for the driver correctness walk.

The driver checks only ~50 catalog entries per round, walking
``__spark_entry__.queries()`` in dict order. Earlier rounds ordered by a
hard-coded "already checked" set, which left one hole in the correctness
signal: an entry whose CODE changed after its last green row kept its
low priority and could go unre-checked for rounds.

This module closes that hole with a per-entry content hash persisted in
``tools/gate_state.json`` (checked into the repo, regenerated per round
from the CORRECTNESS_r*.json the driver writes — see
``tools/gate_state.py``). Gate order becomes:

1. entries whose current hash differs from the hash recorded at their
   last green driver row (MODIFIED — re-verify first);
2. entries with no recorded row at all (never checked);
3. everything else, oldest-checked round first.

The hash covers the entry's own function source, its oracle SQL, and one
level of package dependencies: a referenced helper defined in our
package contributes its function source; a referenced package MODULE
(e.g. ``operators.dedup``) contributes its file hash. Same-module helper
granularity matters — ``queries.py`` holds all 140+ entry functions, so
hashing the whole module would mark everything modified whenever
anything is edited.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import types
from collections.abc import Mapping

_PKG = __name__.rsplit(".", 1)[0]
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(_REPO_ROOT, "tools", "gate_state.json")

_module_hash_cache: dict[str, str] = {}


def _module_hash(mod: types.ModuleType) -> str:
    name = mod.__name__
    if name not in _module_hash_cache:
        try:
            with open(mod.__file__, "rb") as f:
                _module_hash_cache[name] = hashlib.md5(f.read()).hexdigest()
        except (OSError, TypeError, AttributeError):
            _module_hash_cache[name] = name
    return _module_hash_cache[name]


def _dep_parts(fn) -> list[str]:
    """One dependency level: sources of same-package helpers the entry
    references, file hashes of package modules it references."""
    code = getattr(fn, "__code__", None)
    g = getattr(fn, "__globals__", None)
    if code is None or g is None:
        return []
    parts: dict[str, str] = {}
    for name in code.co_names:
        v = g.get(name)
        if v is None:
            continue
        if isinstance(v, types.ModuleType):
            if v.__name__.startswith(_PKG):
                parts.setdefault("m:" + v.__name__, _module_hash(v))
        elif callable(v) and getattr(v, "__module__", "").startswith(_PKG):
            try:
                parts.setdefault("f:" + v.__module__ + "." + name,
                                 inspect.getsource(v))
            except (OSError, TypeError):
                mod = sys.modules.get(v.__module__)
                if mod is not None:
                    parts.setdefault("m:" + v.__module__, _module_hash(mod))
    return [parts[k] for k in sorted(parts)]


def _local_import_parts(source: str) -> list[str]:
    """Function-LOCAL imports bind locals, not globals, so they are
    invisible to ``_dep_parts`` — catch them textually and hash the
    referenced package module files.

    ``from pkg.sub import name`` must resolve each imported *name*: if
    ``pkg.sub.name`` is itself a module, hash that leaf module's file,
    not the package ``__init__`` (the r7 blind spot — edits to a leaf
    module imported this way did not re-prioritize dependent entries)."""
    import importlib
    import re

    def _load(mod_name: str):
        try:
            return sys.modules.get(mod_name) or importlib.import_module(mod_name)
        except ImportError:
            return None

    parts: dict[str, str] = {}

    def _add(mod) -> None:
        # same package guard as _dep_parts: a re-exported third-party
        # module must not leak an environment-dependent file hash
        if mod is not None and mod.__name__.startswith(_PKG):
            parts.setdefault("m:" + mod.__name__, _module_hash(mod))

    pkg = re.escape(_PKG)
    # strip comments BEFORE folding continuations (a backslash at the
    # end of a comment is not a continuation): comment words after an
    # import must not be scanned as candidate import names, e.g.
    # ``from pkg.x import y  # see: a, b`` must not probe pkg.x.a/pkg.x.b.
    # Conservative: only strip when no quote character precedes the '#'
    # on the line — a '#' inside a string literal must not delete the
    # rest of the line (an import after it would silently drop from the
    # hash, the staleness class this scan exists to prevent).
    # Accepted residual of that conservatism: on a line that has a string
    # literal BEFORE the '#' (``x = "s"  # import pkg.mod``) the comment
    # survives the strip and its text is still scanned, which can add a
    # spurious package-module hash to the entry hash. Extra deps only
    # force re-verification, never staleness, so this errs in the safe
    # direction; a tokenize-based strip would remove it if it ever costs.
    source = re.sub(r"(?m)^([^'\"#\n]*)#[^\n]*$", r"\1", source)
    source = source.replace("\\\n", " ")  # fold line continuations
    for base, names in re.findall(
        rf"from\s+({pkg}(?:\.\w+)*)\s+import\s+(\([^)]*\)|[^\n]+)", source
    ):
        base_mod = _load(base)
        _add(base_mod)
        for clause in names.strip("()").split(","):
            name = clause.split()[0] if clause.split() else ""
            if not name:
                continue
            sub = getattr(base_mod, name, None)
            if sub is None:
                # not an attribute of an already-imported package: only
                # an actual import attempt can tell module from function.
                # (An existing non-module attribute is the real binding —
                # from-import binds the attribute over a same-named
                # submodule — so no import attempt for those.)
                sub = _load(base + "." + name)
            if isinstance(sub, types.ModuleType):
                _add(sub)
    # ``import pkg.sub.mod`` — a dotted target after ``import`` can only
    # be a plain-import statement (``from X import Y`` targets are bare).
    # Split the target list on commas so multi-target plain imports
    # (``import os, pkg.sub.mod``) are not missed. Anchored to statement
    # position (line start or after ';') so ``import pkg...`` text inside
    # string literals / docstrings of the scanned source is not treated
    # as an import (which would import_module it for side effects and add
    # a spurious dep hash).
    for stmt in re.findall(r"(?m)(?:^[ \t]*|;[ \t]*)import\s+([^\n;]+)",
                           source):
        for target in stmt.split(","):
            m = re.match(rf"\s*({pkg}(?:\.\w+)+)", target)
            if m:
                _add(_load(m.group(1)))
    return [parts[k] for k in sorted(parts)]


def entry_hash(entry) -> str:
    """Deterministic content hash of a QueryDef: its own source, its
    oracle SQL, and one level of package dependencies."""
    fn = entry.spark
    try:
        own = inspect.getsource(fn)
    except (OSError, TypeError):
        own = repr(fn)
    deps = sorted(set(_dep_parts(fn)) | set(_local_import_parts(own)))
    blob = "\x00".join([own, entry.oracle or ""] + deps)
    return hashlib.md5(blob.encode()).hexdigest()


def load_state() -> dict:
    try:
        with open(STATE_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def save_state(state: dict) -> None:
    with open(STATE_PATH, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.write("\n")


def gate_order(catalog: Mapping, state: dict | None = None) -> list[str]:
    """Catalog names ordered modified-first / never-checked / oldest-
    checked, deterministic (alphabetical within each tier)."""
    if state is None:
        state = load_state()
    ranked = []
    for name in catalog:
        rec = state.get(name)
        if rec is None:
            tier = (1, 0)  # never driver-checked
        elif rec.get("hash") != entry_hash(catalog[name]):
            tier = (0, 0)  # code changed since last green row
        else:
            tier = (2, rec.get("round", 0))  # oldest-checked first
        ranked.append((tier, name))
    return [name for _tier, name in sorted(ranked)]


def record_round(catalog: Mapping, correctness: Mapping, round_no: int,
                 state: dict | None = None) -> dict:
    """Fold one round's CORRECTNESS json into the state: every entry
    with a green row (hash match, or a rows-only ``no_oracle`` row that
    produced rows) records the CURRENT content hash and the round."""
    if state is None:
        state = load_state()
    for name, row in correctness.items():
        if name not in catalog:
            continue
        green = row.get("hash_match") is True or (
            row.get("err") == "no_oracle"
            and (row.get("spark_rows") or 0) >= 0
        )
        if green:
            state[name] = {
                "round": round_no,
                "hash": entry_hash(catalog[name]),
            }
    return state
