"""Hydra-compatible YAML configuration without the hydra dependency.

The reference composes ``configs/config.yaml`` with group directories
``dataset/ model/ solver/`` and CLI overrides (``train.py dataset=…
solver.lr.alpha.gen=0.001``), then persists the resolved config into the
run dir for the eval scripts to consume (SURVEY.md §5.6).  This module
reproduces that workflow — the reference's YAML files load verbatim —
with plain PyYAML:

* ``compose(config_dir, overrides)``: read the root config, resolve its
  ``defaults`` list, apply ``group=choice`` and dotted-path overrides;
* ``Config``: a nested dict with attribute access (OmegaConf-ish);
* ``save``/``load`` round-trip the resolved config as YAML.
"""

from __future__ import annotations

import copy
import os
import os.path as osp
from datetime import datetime
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with recursive attribute access."""

    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value):
        self[name] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_plain(self) -> Any:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_plain(), sort_keys=False)


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _set_dotted(cfg: Dict, dotted: str, value):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def _parse_value(text: str):
    return yaml.safe_load(text)


def compose(
    config_dir: str,
    overrides: Optional[List[str]] = None,
    config_name: str = "config",
) -> Config:
    """Hydra-style composition. ``overrides``: ["dataset=kitti_odometry",
    "solver.lr.alpha.gen=0.001", ...].  Returns the resolved Config with
    ``_choices`` recording the selected group options (used for the run
    dir template)."""
    overrides = list(overrides or [])
    root = _load_yaml(osp.join(config_dir, config_name + ".yaml"))
    defaults = root.pop("defaults", [])

    # group selections: defaults list entries {group: choice}, overridable
    choices: Dict[str, str] = {}
    for entry in defaults:
        if isinstance(entry, dict):
            for group, choice in entry.items():
                choices[str(group)] = str(choice)
    group_overrides = {}
    dotted_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, _, val = ov.partition("=")
        if key in choices and "." not in key:
            group_overrides[key] = val
        elif "." not in key and osp.isdir(osp.join(config_dir, key)):
            group_overrides[key] = val
        else:
            dotted_overrides.append((key, val))
    choices.update(group_overrides)

    cfg: Dict = {}
    for group, choice in choices.items():
        path = osp.join(config_dir, group, choice + ".yaml")
        if not osp.exists(path):
            avail = sorted(
                p[:-5] for p in os.listdir(osp.join(config_dir, group))
                if p.endswith(".yaml")
            ) if osp.isdir(osp.join(config_dir, group)) else []
            raise FileNotFoundError(
                f"config group '{group}' has no option '{choice}' "
                f"(available: {avail})"
            )
        cfg[group] = _load_yaml(path)
    # root-level (non-group) keys
    for k, v in root.items():
        if k == "hydra":
            continue
        cfg.setdefault(k, v)

    for key, val in dotted_overrides:
        _set_dotted(cfg, key, _parse_value(val))

    cfg["_choices"] = dict(choices)
    return Config.wrap(cfg)


def run_dir_for(cfg: Config, base: str = "outputs/logs", now: Optional[datetime] = None) -> str:
    """Reference run-dir template (configs/config.yaml:17-21):
    outputs/logs/dataset=…/model=…/solver=…/<date>/<time>."""
    now = now or datetime.now()
    ch = cfg.get("_choices", {})
    return osp.join(
        base,
        f"dataset={ch.get('dataset', 'unknown')}",
        f"model={ch.get('model', 'unknown')}",
        f"solver={ch.get('solver', 'unknown')}",
        now.strftime("%Y-%m-%d"),
        now.strftime("%H-%M-%S"),
    )


def save_config(cfg: Config, run_dir: str):
    """Persist the resolved config like hydra's .hydra/config.yaml — eval
    scripts consume this file (evaluate_synthesis.py --config-path)."""
    d = osp.join(run_dir, ".hydra")
    os.makedirs(d, exist_ok=True)
    plain = cfg.to_plain()
    plain.pop("_choices", None)
    with open(osp.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(plain, f, sort_keys=False)


def load_config(path: str) -> Config:
    """Load a resolved config YAML (ours or a reference run's)."""
    return Config.wrap(_load_yaml(path))
