"""Config compiler: Python conf modules -> canonical, validated JSON.

Re-expresses the reference's repo compiler
(api/py/ai/chronon/repo/compile.py: walk a conf directory, import each
module, collect the GroupBy/Join/StagingQuery objects, validate, and write
one canonical JSON artifact per object) without Thrift: configs here are
plain dataclasses (`raywin/api.py`), so the canonical form is a type-tagged
JSON tree that round-trips losslessly through ``to_conf``/``from_conf``.

The compiled artifacts are what `ray job submit` ships to a cluster —
`raywin.run --conf path/to/compiled.json` loads one without importing user
Python.  Every artifact records the config's semantic hash so downstream
manifests can detect drift.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import json
import os
from enum import Enum
from typing import Any

from . import api
from .pipelines.staging import StagingQuery

# every compilable dataclass, by class name (the JSON "__type__" tag)
_REGISTRY: dict[str, type] = {
    cls.__name__: cls
    for cls in vars(api).values()
    if dataclasses.is_dataclass(cls) and isinstance(cls, type)
}
_REGISTRY["StagingQuery"] = StagingQuery
_ENUMS: dict[str, type] = {
    cls.__name__: cls
    for cls in vars(api).values()
    if isinstance(cls, type) and issubclass(cls, Enum) and cls is not Enum
}

TOP_LEVEL = (api.GroupBy, api.Join, StagingQuery)


def to_conf(obj: Any) -> Any:
    """Config object -> type-tagged JSON tree (deterministic key order)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"__type__": type(obj).__name__}
        for f in dataclasses.fields(obj):
            out[f.name] = to_conf(getattr(obj, f.name))
        return out
    if isinstance(obj, Enum):
        return {"__enum__": type(obj).__name__, "value": obj.value}
    if isinstance(obj, (list, tuple)):
        return [to_conf(v) for v in obj]
    if isinstance(obj, dict):
        return {k: to_conf(v) for k, v in obj.items()}
    return obj


def from_conf(tree: Any) -> Any:
    """Inverse of ``to_conf`` — rebuilds the dataclass/enum graph."""
    if isinstance(tree, dict) and "__enum__" in tree:
        return _ENUMS[tree["__enum__"]](tree["value"])
    if isinstance(tree, dict) and "__type__" in tree:
        cls = _REGISTRY[tree["__type__"]]
        kwargs = {k: from_conf(v) for k, v in tree.items() if k != "__type__"}
        return cls(**kwargs)
    if isinstance(tree, list):
        return [from_conf(v) for v in tree]
    if isinstance(tree, dict):
        return {k: from_conf(v) for k, v in tree.items()}
    return tree


def _import_conf_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _validate(obj) -> list[str]:
    from . import analyzer

    # structural validation only: at compile time source tables may not be
    # reachable from the submitting machine (the reference validates confs
    # against metadata, not data)
    if isinstance(obj, api.Join):
        return analyzer.validate_join(obj, check_tables=False)
    if isinstance(obj, api.GroupBy):
        return analyzer.validate_group_by(obj, check_tables=False)
    return []  # StagingQuery: macros validated at render time


def compile_repo(conf_dir: str, out_dir: str) -> dict:
    """Walk ``conf_dir`` for ``*.py`` modules (ignoring ``_*``), collect
    every module-level GroupBy / Join / StagingQuery, validate each, and
    write ``<out_dir>/<kind>/<relmodule>.<attr>.json``.

    Returns {"compiled": [...], "errors": {artifact: [msgs]}}; artifacts
    with validation errors are reported and NOT written.  Duplicate conf
    names across modules are an error (the reference enforces unique
    names per team the same way)."""
    compiled: list[str] = []
    errors: dict[str, list[str]] = {}
    seen_names: dict[str, str] = {}
    for root, _dirs, files in os.walk(conf_dir):
        for fname in sorted(files):
            if not fname.endswith(".py") or fname.startswith("_"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, conf_dir)
            mod_label = rel[:-3].replace(os.sep, ".")
            try:
                mod = _import_conf_module(path, f"raywin_confs.{mod_label}")
            except Exception as e:  # a broken module fails its file, not the run
                errors[mod_label] = [f"import failed: {e!r}"]
                continue
            for attr, obj in sorted(vars(mod).items()):
                if not isinstance(obj, TOP_LEVEL) or attr.startswith("_"):
                    continue
                kind = type(obj).__name__.lower()
                artifact = f"{mod_label}.{attr}"
                errs = _validate(obj)
                if errs:
                    errors[artifact] = errs
                    continue
                prev = seen_names.get(obj.name)
                if prev is not None:
                    errors[artifact] = [
                        f"duplicate conf name {obj.name!r} (also defined by {prev})"
                    ]
                    continue
                seen_names[obj.name] = artifact
                tree = to_conf(obj)
                tree["__semantic_hash__"] = api.semantic_hash(obj)
                dest = os.path.join(out_dir, kind, f"{artifact}.json")
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "w") as f:
                    json.dump(tree, f, indent=2, sort_keys=True)
                compiled.append(dest)
    return {"compiled": compiled, "errors": errors}


def load_compiled(path: str):
    """Compiled JSON artifact -> config object (drops the hash stamp)."""
    with open(path) as f:
        tree = json.load(f)
    tree.pop("__semantic_hash__", None)
    return from_conf(tree)
