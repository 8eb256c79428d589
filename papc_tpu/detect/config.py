"""Detection config system: YAML with base-config inheritance + dotted
CLI overrides.

Reference parity: ``params/configs/__init__.py`` — ``_BASE_CONFIG_``
recursive merge (:51-68), ``cfg_from_list`` dotted-path overrides with
type coercion (:16-48), attribute-style access. Unlike the reference
there is no global mutable singleton and no mutate-in-place functor
injection — configs are plain data; builders consume them.
"""

from __future__ import annotations

import ast
from pathlib import Path

import yaml


class Config(dict):
    """dict with attribute access (EasyDict-alike, recursion-free)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.wrap(v) for v in obj)
        return obj


def merge_new_config(config: dict, new_config: dict) -> dict:
    """Recursive merge; ``_BASE_CONFIG_`` pulls in a parent YAML first
    (reference :51-68)."""
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"]) as f:
            base = yaml.safe_load(f)
        config.update(merge_new_config({}, base))
    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if (
            isinstance(val, dict)
            and key in config
            and isinstance(config[key], dict)
        ):
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file: str) -> Config:
    with open(cfg_file) as f:
        new_config = yaml.safe_load(f)
    return Config.wrap(merge_new_config({}, new_config or {}))


def cfg_from_list(cfg: dict, cfg_list: list) -> None:
    """Apply ``["A.B.C", value, ...]`` dotted overrides in place with
    type coercion against the existing value (reference :16-48)."""
    assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        d = cfg
        keys = full_key.split(".")
        for sub in keys[:-1]:
            assert sub in d, f"unknown config key: {full_key}"
            d = d[sub]
        last = keys[-1]
        assert last in d, f"unknown config key: {full_key}"
        try:
            value = ast.literal_eval(v) if isinstance(v, str) else v
        except (ValueError, SyntaxError):
            value = v
        old = d[last]
        if old is not None and value is not None:
            assert isinstance(value, type(old)) or (
                isinstance(value, (int, float))
                and isinstance(old, (int, float))
            ), (
                f"type mismatch for {full_key}: "
                f"{type(value)} vs {type(old)}"
            )
        d[last] = value


def log_config_to_file(cfg: dict, pre: str = "cfg", log=print):
    for key, val in cfg.items():
        if isinstance(val, dict):
            log(f"\n{pre}.{key} = edict()")
            log_config_to_file(val, pre=f"{pre}.{key}", log=log)
        else:
            log(f"{pre}.{key}: {val}")


def save_config(cfg: dict, path: str):
    def plain(obj):
        if isinstance(obj, dict):
            return {k: plain(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [plain(v) for v in obj]
        return obj

    Path(path).write_text(yaml.safe_dump(plain(cfg), sort_keys=False))


DEFAULT_CONFIG_PATH = str(
    Path(__file__).parent / "configs" / "pointpillars_kitti_car.yaml"
)
