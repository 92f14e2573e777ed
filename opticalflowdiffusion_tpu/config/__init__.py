"""Hydra-compatible configuration composition, TPU-native framework edition.

The reference drives everything through a 3-group Hydra defaults list
(reference: configurations/config.yaml:1-13) with group-internal ``defaults:
[base]`` inheritance (reference: configurations/experiment/matrix_flow.yaml:1-2)
and the CLI override grammar ``group=option``, ``a.b=value`` and ``+new.key=value``
(reference: README.md:9, main.py:24-28).

This module reproduces that config surface without a Hydra dependency:
YAML group files live in ``configurations/{experiment,dataset,algorithm}``
with the same names and keys as the reference, composed by :func:`compose`.
"""

from __future__ import annotations

import copy
import re
import os
from pathlib import Path
from typing import Any, Dict, Iterator, List, Mapping, Optional

import yaml

CONFIG_ROOT = Path(__file__).parent / "configurations"


class Config(Mapping):
    """Attribute-style nested config, a minimal ``omegaconf.DictConfig`` stand-in.

    Supports ``cfg.algorithm.lr``, ``'radius' in dir(cfg)`` (the reference's
    optional-key idiom, e.g. flow_learner.py:71), ``cfg.get(...)``, ``in``,
    iteration, and conversion back to plain dicts.
    """

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self[k] = v

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, Mapping) and not isinstance(value, Config):
            value = Config(dict(value))
        self._data[key] = value

    def __delitem__(self, key: str) -> None:
        del self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __dir__(self) -> List[str]:
        return list(self._data.keys()) + [
            "get", "keys", "items", "values", "to_dict", "merge", "copy"
        ]

    # -- helpers -----------------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def merge(self, other: Mapping) -> "Config":
        """Deep-merge ``other`` into self (in place). Returns self."""
        for k, v in other.items():
            if (
                k in self._data
                and isinstance(self._data[k], Config)
                and isinstance(v, Mapping)
            ):
                self._data[k].merge(v)
            else:
                self[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v
        return self

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self.to_dict(), memo))


_SCI_FLOAT = re.compile(
    r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)$"
)


def _fix_scientific(value: Any) -> Any:
    """PyYAML (YAML 1.1) parses '1e-4' as a string; Hydra/OmegaConf parse it
    as a float. Recursively coerce such strings so the reference's yaml files
    (e.g. flow_diffuser.yaml 'lr: 1e-5') keep their meaning."""
    if isinstance(value, str) and _SCI_FLOAT.match(value):
        return float(value)
    if isinstance(value, dict):
        return {k: _fix_scientific(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_fix_scientific(v) for v in value]
    return value


def _parse_scalar(text: str) -> Any:
    """Parse a CLI value with YAML scalar semantics (1e-4 -> float, true -> bool)."""
    try:
        return _fix_scientific(yaml.safe_load(text))
    except yaml.YAMLError:
        return text


def _load_yaml(path: Path) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f)
    return _fix_scientific(data or {})


def _load_group_option(group: str, option: str, root: Path) -> Config:
    """Load a group option file, resolving its internal ``defaults`` list.

    Mirrors the reference's group-internal inheritance
    (configurations/experiment/matrix_flow.yaml:1-2 ``defaults: [base]``).
    """
    path = root / group / f"{option}.yaml"
    if not path.exists():
        available = sorted(p.stem for p in (root / group).glob("*.yaml"))
        raise FileNotFoundError(
            f"Unknown {group} option '{option}'. Available: {available}"
        )
    data = _load_yaml(path)
    defaults = data.pop("defaults", [])
    cfg = Config()
    for base in defaults:
        if isinstance(base, str):
            cfg.merge(_load_group_option(group, base, root))
    cfg.merge(data)
    return cfg


def compose(
    overrides: Optional[List[str]] = None,
    config_root: Optional[os.PathLike] = None,
    config_name: str = "config",
) -> Config:
    """Compose the full config exactly like the reference's Hydra app.

    ``overrides`` uses the Hydra CLI grammar (reference: README.md:9):
      * ``experiment=matrix_flow``    — select a group option
      * ``algorithm.lr=1e-4``         — override a leaf
      * ``+wandb.name=example``       — add a new key
      * ``++key=value``               — force add/override
      * ``~algorithm.flow_max``       — delete a key (Hydra tilde grammar)
    """
    root = Path(config_root) if config_root else CONFIG_ROOT
    overrides = list(overrides or [])

    primary = _load_yaml(root / f"{config_name}.yaml")
    defaults = primary.pop("defaults", [])

    group_selection: Dict[str, str] = {}
    for entry in defaults:
        if isinstance(entry, dict):
            for group, option in entry.items():
                group_selection[str(group)] = str(option)

    # First pass: group re-selection overrides (``experiment=foo``).
    kv_overrides: List[tuple] = []
    deletions: List[str] = []
    for ov in overrides:
        if ov.startswith("~"):
            if "=" in ov:
                raise ValueError(f"Deletion override '{ov}' takes no value")
            deletions.append(ov[1:])
            continue
        if "=" not in ov:
            raise ValueError(f"Malformed override '{ov}' (expected key=value)")
        key, value = ov.split("=", 1)
        additive = key.startswith("+")
        key = key.lstrip("+")
        if key in group_selection and "." not in key and not additive:
            group_selection[key] = value
        else:
            kv_overrides.append((key, _parse_scalar(value), additive))

    cfg = Config()
    for group, option in group_selection.items():
        cfg[group] = _load_group_option(group, option, root)

    cfg.merge(primary)

    # Second pass: dotted key/value overrides.
    for key, value, additive in kv_overrides:
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node:
                node[part] = Config()
            node = node[part]
            if not isinstance(node, Config):
                raise ValueError(f"Cannot override through non-dict key '{part}'")
        leaf = parts[-1]
        if not additive and leaf not in node:
            raise KeyError(
                f"Override key '{key}' not found; use +{key}=... to add new keys"
            )
        node[leaf] = value

    for key in deletions:
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node:
                raise KeyError(f"Deletion key '{key}' not found")
            node = node[part]
        if parts[-1] not in node:
            raise KeyError(f"Deletion key '{key}' not found")
        del node[parts[-1]]

    return cfg


__all__ = ["Config", "compose", "CONFIG_ROOT"]
