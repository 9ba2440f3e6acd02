"""Dotted-target factory + YAML config loading.

Equivalent of the reference's ``instantiate_from_config`` pattern
(utils.py:44-52) without OmegaConf: plain YAML (PyYAML ships with jax's
deps) into nested dicts, ``target:``/``params:`` blocks instantiated by
import path.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict


def get_obj_from_str(path: str):
    module, name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(cfg: Dict) -> Any:
    if "target" not in cfg:
        raise KeyError("expected a `target` key")
    return get_obj_from_str(cfg["target"])(**cfg.get("params", {}))


def load_yaml(path: str) -> Dict:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)
