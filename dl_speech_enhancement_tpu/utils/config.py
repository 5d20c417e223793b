"""YAML config system, schema-compatible with the reference's config/**.

The reference merges argparse values into the YAML dict and persists the
result into the experiment directory (bin/train.py:52-64); checkpoints are
loaded with the sibling ``config.yml`` (bin/utils.py:17-22). Both contracts
are kept.
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str, overrides: dict | None = None) -> dict:
    with open(path) as f:
        config = yaml.safe_load(f)
    if overrides:
        config.update(overrides)
    return config


def save_config(path: str, config: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_plain(config), f, sort_keys=False)


def _plain(obj):
    """Make the config YAML-serializable (tuples -> lists etc.)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def load_config_beside(checkpoint_path: str) -> dict:
    """Load the config.yml stored next to a checkpoint (bin/utils.py:10-22)."""
    dirname = os.path.dirname(checkpoint_path)
    config_path = os.path.join(dirname, "config.yml")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"config.yml not found beside {checkpoint_path}")
    return load_config(config_path)
