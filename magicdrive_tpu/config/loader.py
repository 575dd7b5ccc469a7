"""Hydra-style config composition on plain YAML (no omegaconf dependency).

Reproduces the reference's config ergonomics (SURVEY.md §5.6,
ref:configs/config.yaml, ref:tools/train.py @hydra.main):

* group composition via a root ``defaults`` list (``{model: SDv1.5mv_rawbox}``
  loads ``model/SDv1.5mv_rawbox.yaml`` under key ``model``);
* ``# @package _global_`` experiment overlays (``exp/224x400.yaml`` merges at
  the root when the file sets ``_global_: true``);
* ``${a.b.c}`` interpolation resolved after the merge
  (ref:configs/model/SDv1.5mv_rawbox.yaml:20);
* dotted CLI overrides ``runner.learning_rate=1e-4`` (``+key`` adds new keys,
  ref:README.MD:219);
* run-dir config persistence + override replay so inference always recomposes
  the training config (ref:tools/test.py:46-56).
"""
from __future__ import annotations

import ast
import copy
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) \
            else v

    def __setattr__(self, k, v):
        self[k] = v


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_PART = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(tree: Dict, dotted: str):
    cur: Any = tree
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def _resolve(node: Any, root: Dict, depth: int = 0) -> Any:
    if depth > 20:
        raise ValueError("interpolation cycle")
    if isinstance(node, dict):
        return {k: _resolve(v, root, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root, depth) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:  # whole-value interpolation preserves type
            return _resolve(_lookup(root, m.group(1)), root, depth + 1)
        return _INTERP_PART.sub(
            lambda mm: str(_resolve(_lookup(root, mm.group(1)), root,
                                    depth + 1)), node)
    return node


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        low = s.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("null", "none"):
            return None
        return s


def _set_dotted(tree: Dict, dotted: str, value: Any, allow_new: bool) -> None:
    parts = dotted.split(".")
    cur = tree
    for p in parts[:-1]:
        if p not in cur:
            if not allow_new:
                raise KeyError(
                    f"unknown config path '{dotted}' (use +{dotted}= to add)")
            cur[p] = {}
        cur = cur[p]
    if parts[-1] not in cur and not allow_new:
        raise KeyError(
            f"unknown config key '{dotted}' (use +{dotted}= to add)")
    cur[parts[-1]] = value


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def compose(config_dir: str, name: str = "config",
            overrides: Optional[Sequence[str]] = None,
            resolve: bool = True) -> Config:
    """Compose ``{config_dir}/{name}.yaml`` with its defaults + overrides.

    Override syntax: ``a.b=v`` (must exist), ``+a.b=v`` (may add),
    ``group@=name`` or ``group=name`` when ``group`` is in the defaults list
    (swaps the group file, e.g. ``runner=debug``).
    """
    overrides = list(overrides or [])
    root_cfg = _load_yaml(os.path.join(config_dir, f"{name}.yaml"))
    defaults = root_cfg.pop("defaults", [])

    # group swaps from overrides, e.g. "runner=debug"
    group_names = [list(d)[0] if isinstance(d, dict) else d for d in defaults]
    remaining = []
    swaps: Dict[str, str] = {}
    for ov in overrides:
        key = ov.split("=", 1)[0].lstrip("+")
        if "=" in ov and "." not in key and (
                key in group_names or
                os.path.isdir(os.path.join(config_dir, key))):
            swaps[key] = ov.split("=", 1)[1]
        else:
            remaining.append(ov)

    tree: Dict = {}
    for d in defaults:
        if isinstance(d, dict):
            group, fname = next(iter(d.items()))
            fname = swaps.get(group, fname)
            if fname is None:
                continue
            sub = _load_yaml(os.path.join(config_dir, group, f"{fname}.yaml"))
            if sub.pop("_global_", False):
                tree = _deep_merge(tree, sub)
            else:
                tree = _deep_merge(tree, {group: sub})
        else:  # plain file at root level
            tree = _deep_merge(tree, _load_yaml(
                os.path.join(config_dir, f"{d}.yaml")))
    tree = _deep_merge(tree, root_cfg)

    # groups not in defaults (e.g. `exp=224x400`, `fid=default`) load as
    # overlays: _global_ files merge at root, others under their group key
    for group, fname in swaps.items():
        if group in group_names:
            continue
        sub = _load_yaml(os.path.join(config_dir, group, f"{fname}.yaml"))
        if sub.pop("_global_", False):
            tree = _deep_merge(tree, sub)
        else:
            tree = _deep_merge(tree, {group: sub})

    for ov in remaining:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, val = ov.split("=", 1)
        allow_new = key.startswith("+")
        _set_dotted(tree, key.lstrip("+"), _parse_value(val), allow_new)

    if resolve:
        tree = _resolve(tree, tree)
    return Config(tree)


def save_run_config(cfg: Config, run_dir: str,
                    overrides: Optional[Sequence[str]] = None) -> None:
    """Persist the composed config + raw overrides for replay
    (the reference's hydra output dir, ref:configs/config.yaml:11-14),
    plus the effective trace-time perf-knob snapshot — the MAGICDRIVE_*
    env knobs change the compiled program without appearing in the YAML,
    so a run is only self-reproducing if they are recorded too."""
    from magicdrive_tpu.utils.knobs import perf_knob_snapshot

    os.makedirs(run_dir, exist_ok=True)
    payload = dict(cfg)
    payload["perf_knobs"] = perf_knob_snapshot()
    with open(os.path.join(run_dir, "run_config.yaml"), "w") as f:
        yaml.safe_dump(payload, f, sort_keys=False)
    with open(os.path.join(run_dir, "overrides.yaml"), "w") as f:
        yaml.safe_dump(list(overrides or []), f)


def load_run_config(run_dir: str) -> Config:
    """Reload a run's exact composed config (ref:tools/test.py:46-56).
    Warns per perf knob whose currently-effective value differs from the
    snapshot recorded at run time (exact replay needs the MAGICDRIVE_* env
    to match)."""
    from magicdrive_tpu.utils.knobs import warn_on_knob_mismatch

    cfg = Config(_load_yaml(os.path.join(run_dir, "run_config.yaml")))
    warn_on_knob_mismatch(cfg.get("perf_knobs") or {})
    return cfg


def load_run_overrides(run_dir: str) -> List[str]:
    path = os.path.join(run_dir, "overrides.yaml")
    return _load_yaml(path) if os.path.isfile(path) else []
