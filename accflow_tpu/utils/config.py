"""YAML config loading (reference utils/util.py:11-61) with attribute
access (replacing the easydict dependency)."""

from __future__ import annotations

from typing import Any, Dict

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.wrap(v) for v in obj)
        return obj


def parse_options(path: str) -> AttrDict:
    with open(path) as f:
        opt: Dict = yaml.safe_load(f)
    return AttrDict.wrap(opt)
