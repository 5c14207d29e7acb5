"""YAML config system, schema-compatible with the reference.

Reproduces the reference's semantics (reference core/config/config.py:26-133):

  * a default config chain (``default.yaml`` + ``includes:``) provides base
    values;
  * ``includes:`` entries are YAML fragments merged in (include < including
    file at the top level);
  * merge priority: console/overrides > user yaml > default.yaml;
  * the merge is a *shallow* top-level key replacement (the reference's
    ``_update`` replaces whole top-level values, it does not deep-merge);
  * scientific-notation floats like ``1e-3`` parse as floats (the reference
    installs a fixed float resolver for this, config.py:58-72).

Differences (deliberate improvements): includes are resolved relative to the
config file's directory first (the reference hardcodes ``./config/`` relative
to the CWD, config.py:80), and a recursion guard rejects include cycles.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, Optional

import yaml

_PKG_DIR = os.path.dirname(__file__)
DEFAULT_FILE = os.path.join(_PKG_DIR, "default.yaml")

_FLOAT_RE = re.compile(
    """^(?:[-+]?[0-9][0-9_]*\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?[0-9][0-9_]*[eE][-+]?[0-9]+
        |\\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\\.(?:inf|Inf|INF)
        |\\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _Loader(yaml.SafeLoader):
    """SafeLoader with a YAML-1.2-style float resolver (so 1e-3 is a float)."""


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_RE, list("-+0123456789.")
)


def _read_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as fin:
        out = yaml.load(fin.read(), Loader=_Loader)
    return out or {}


def _resolve_include(include: str, base_dir: str, search_dirs) -> str:
    cands = [os.path.join(base_dir, include)]
    cands += [os.path.join(d, include) for d in search_dirs]
    cands.append(include)
    for c in cands:
        if os.path.isfile(c):
            return os.path.abspath(c)
    raise FileNotFoundError(
        f"config include '{include}' not found; searched {cands}"
    )


def _load_with_includes(path: str, search_dirs, _seen=None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    _seen = set() if _seen is None else _seen
    if path in _seen:
        raise ValueError(f"config include cycle at {path}")
    _seen = _seen | {path}

    file_dict = _read_yaml(path)
    merged: Dict[str, Any] = {}
    base_dir = os.path.dirname(path)
    for include in file_dict.get("includes", []) or []:
        inc_path = _resolve_include(include, base_dir, search_dirs)
        merged.update(_load_with_includes(inc_path, search_dirs, _seen))
    merged.update({k: v for k, v in file_dict.items() if k != "includes"})
    return merged


class Config:
    """Parses and merges default.yaml, a user config, and overrides.

    Merge priority (low -> high): default chain < user yaml < overrides,
    matching reference core/config/config.py:119-133.
    """

    def __init__(
        self,
        config_file: Optional[str] = None,
        overrides: Optional[Dict[str, Any]] = None,
        search_dirs: Optional[list] = None,
    ):
        self.config_file = config_file
        repo_config = os.path.join(os.getcwd(), "config")
        repo_configs = os.path.join(os.getcwd(), "configs")
        self.search_dirs = list(search_dirs or [])
        if config_file:
            self.search_dirs.append(os.path.dirname(os.path.abspath(config_file)))
        self.search_dirs += [repo_config, repo_configs, _PKG_DIR]

        self.default_dict = _load_with_includes(DEFAULT_FILE, [_PKG_DIR])
        self.file_dict = (
            _load_with_includes(config_file, self.search_dirs) if config_file else {}
        )
        self.console_dict = dict(overrides or {})
        self.config_dict = {}
        for d in (self.default_dict, self.file_dict, self.console_dict):
            self.config_dict.update(copy.deepcopy(d))

    def get_config_dict(self) -> Dict[str, Any]:
        return self.config_dict


def load_config(path: Optional[str] = None, **overrides) -> Dict[str, Any]:
    return Config(path, overrides=overrides).get_config_dict()
