"""Config loader — deep-merge defaults + dot-path access.

Re-expresses the reference ``ConfigLoader``
(``/root/reference/src/core/config.py:26-148``): a JSON settings file
deep-merged over defaults, dot-path ``get``, and named model/stage
slots.  Here the slots configure pipeline *stages* (batch size,
concurrency, num_cpus) instead of MLX model ids.
"""

from __future__ import annotations

import json
import os
from typing import Any

DEFAULTS: dict[str, Any] = {
    "extraction": {
        "n_partitions": 64,
        "batch_size": 128,
        "bucketed": False,
    },
    "stages": {
        "parse": {"concurrency": None, "batch_size": 128, "num_cpus": 1},
        "embed": {"concurrency": 2, "batch_size": 256, "num_cpus": 1, "dim": 384},
        "validate": {"concurrency": 2, "discard_below": 0.25},
        "media": {"concurrency": 2, "batch_size": 32},
    },
    "dedup": {"minhash": {"num_perm": 64, "num_bands": 16, "shingle_k": 5,
                          "threshold": 0.7}},
    "retrieval": {"top_k": 8, "figure_top_k": 3},
}


def deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class Config:
    def __init__(self, path: str | None = None, overrides: dict | None = None):
        cfg = DEFAULTS
        if path and os.path.isfile(path):
            with open(path) as f:
                cfg = deep_merge(cfg, json.load(f))
        if overrides:
            cfg = deep_merge(cfg, overrides)
        self._cfg = cfg

    def get(self, dotted: str, default: Any = None) -> Any:
        cur: Any = self._cfg
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def stage(self, name: str) -> dict:
        return dict(self.get(f"stages.{name}", {}) or {})
