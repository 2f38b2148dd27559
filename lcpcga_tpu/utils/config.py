"""YAML config handling, schema-compatible with the reference's
training configs (/root/reference/configs/Ours.yaml; re-serialized to
the results dir for provenance like /root/reference/train.py:120-133)."""

from __future__ import annotations

import os

import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def save_config(config: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
