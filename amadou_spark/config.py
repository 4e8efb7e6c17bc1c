"""Layered config loading (reference: ConfigLoader.scala:26-47 +
SparkRunner.scala:51-57).

Resolution order (highest wins):
  explicit overrides → $DEPLOY_ENVIRONMENT file → base file → defaults.

Files are JSON (stdlib); keys are flat dotted strings exactly like the
reference's Typesafe-config paths (`retry.max`, `spark.driver.memory`).
Every `spark.*` key is forwarded into the SparkSession builder
(set-if-missing semantics) — physical tuning stays config-driven, not
code-driven.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

DEFAULTS: dict[str, Any] = {
    # reference defaults: reference.conf:5-13 (retry), :37-38 (spark)
    "retry.max": 3,
    "retry.delay_seconds": 1200.0,
    "spark.master": "local[*]",
    "monitoring.quiet": True,
}


def _flatten(obj: dict[str, Any], prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for key, value in obj.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = value
    return out


@dataclass(frozen=True)
class Config:
    values: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        return self.values.get(key, default)

    def __getitem__(self, key: str) -> Any:
        return self.values[key]

    def with_overrides(self, overrides: dict[str, Any]) -> "Config":
        merged = dict(self.values)
        merged.update(_flatten(overrides))
        return Config(merged)

    def spark_conf(self) -> dict[str, str]:
        """All `spark.*` keys, stringified for SparkConf forwarding
        (reference: SparkRunner.scala:66-73)."""
        return {
            k: str(v).lower() if isinstance(v, bool) else str(v)
            for k, v in self.values.items()
            if k.startswith("spark.")
        }


def load_config(
    base_path: str | Path | None = None,
    overrides: dict[str, Any] | None = None,
    env_var: str = "DEPLOY_ENVIRONMENT",
) -> Config:
    values = dict(DEFAULTS)
    if base_path is not None:
        base_path = Path(base_path)
        if base_path.exists():
            values.update(_flatten(json.loads(base_path.read_text())))
        env = os.environ.get(env_var)
        if env:
            env_path = base_path.with_name(f"{base_path.stem}.{env}{base_path.suffix}")
            if env_path.exists():
                values.update(_flatten(json.loads(env_path.read_text())))
    if overrides:
        values.update(_flatten(overrides))
    return Config(values)
