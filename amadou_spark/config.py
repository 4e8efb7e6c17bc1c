"""Layered config loading (reference: ConfigLoader.scala:26-47 +
SparkRunner.scala:51-57).

Resolution order (highest wins):
  explicit overrides → $DEPLOY_ENVIRONMENT file → base file → defaults.

Files may be JSON, ``.properties`` (java.util.Properties format), or a
HOCON subset covering everything the reference's own conf files use
(nested blocks, dotted paths, ``#``/``//`` comments, later-assignment-
wins, ``${path}`` substitution and ``${?path-or-env}`` optional
substitution, string interpolation). Keys are flat dotted strings
exactly like the reference's Typesafe-config paths (`retry.max`,
`spark.driver.memory`). Every `spark.*` key is forwarded into the
SparkSession builder (set-if-missing semantics) — physical tuning
stays config-driven, not code-driven.
"""

from __future__ import annotations

import json
import os
import re
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
            values.update(read_config_file(base_path))
        env = os.environ.get(env_var)
        if env:
            env_path = base_path.with_name(f"{base_path.stem}.{env}{base_path.suffix}")
            if env_path.exists():
                values.update(read_config_file(env_path))
    if overrides:
        values.update(_flatten(overrides))
    return Config(values)


def read_config_file(path: str | Path) -> dict[str, Any]:
    """Parse one config file into flat dotted keys, by extension:
    ``.json`` → stdlib json, ``.properties`` → java.util.Properties
    format, anything else → the HOCON subset."""
    path = Path(path)
    text = path.read_text()
    if path.suffix == ".json":
        return _flatten(json.loads(text))
    if path.suffix == ".properties":
        return dict(parse_properties(text))
    return parse_hocon(text)


# ------------------------------------------------- .properties / HOCON

def parse_properties(text: str) -> dict[str, str]:
    """java.util.Properties text format: ``k=v`` / ``k: v`` / ``k v``
    lines, ``#``/``!`` comments, backslash line continuation."""
    out: dict[str, str] = {}
    logical: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in "#!":
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            logical.append(line[:-1])
            continue
        logical.append(line)
        joined = "".join(logical)
        logical = []
        m = re.match(r"([^=:\s]+)\s*[=:\s]\s*(.*)", joined)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def load_properties(path: str | Path) -> dict[str, str]:
    """Load a .properties file; raises FileNotFoundError when absent
    (the reference's reader does too: FileInputStream semantics)."""
    return parse_properties(Path(path).read_text())


def properties_from_config(config: "Config", key: str) -> dict[str, str]:
    """ConfigLoader.propertiesValueReader (ConfigLoader.scala:38-47):
    the config value at ``key`` names a .properties file to load; a
    MISSING key yields empty properties, but a present key pointing at
    a missing file raises (FileInputStream behavior)."""
    path = config.get(key)
    if path is None:
        return {}
    return load_properties(str(path))


_SUBST = re.compile(r"\$\{(\??)([^}]+)\}")


def _parse_scalar(token: str) -> Any:
    if len(token) >= 2 and token[0] == '"' and token[-1] == '"':
        return token[1:-1]
    low = token.lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(token)
    except ValueError:
        pass
    try:
        return float(token)
    except ValueError:
        pass
    return token


def parse_hocon(text: str) -> dict[str, Any]:
    """Parse the HOCON subset the reference's conf files actually use.

    Line-oriented: ``key { … }`` blocks nest (dotted keys allowed on
    both blocks and leaves), ``key = value`` / ``key: value`` assign,
    ``#`` and ``//`` start comments, assignments are LAST-WINS in file
    order, and values may reference other paths with ``${path}`` or
    optionally with ``${?path}`` (config path first, then environment;
    an unresolved optional substitution leaves the previous assignment
    in place, an unresolved required one raises KeyError). A value that
    mixes text and substitutions resolves by string interpolation
    (``spark-etl-${deploy.environment}``). Unsupported HOCON (arrays of
    objects, includes, multiline strings) raises ValueError."""
    assignments: list[tuple[str, str]] = []
    stack: list[str] = []

    def strip_comment(line: str) -> str:
        out = []
        in_str = False
        i = 0
        while i < len(line):
            ch = line[i]
            if ch == '"':
                in_str = not in_str
            if not in_str:
                if ch == "#" or line[i : i + 2] == "//":
                    break
            out.append(ch)
            i += 1
        return "".join(out).strip()

    for raw in text.splitlines():
        line = strip_comment(raw)
        if not line:
            continue
        if line == "}":
            if not stack:
                raise ValueError("unbalanced '}' in config")
            stack.pop()
            continue
        m = re.match(r"^([A-Za-z0-9_.\-\"]+)\s*\{$", line)
        if m:
            stack.append(m.group(1).strip('"'))
            continue
        m = re.match(r"^([A-Za-z0-9_.\-\"]+)\s*[=:]\s*(.+?)\s*$", line)
        if m:
            key = ".".join([*stack, m.group(1).strip('"')])
            assignments.append((key, m.group(2)))
            continue
        raise ValueError(f"unsupported HOCON construct: {raw!r}")
    if stack:
        raise ValueError("unbalanced '{' in config")

    values: dict[str, Any] = {}
    for key, raw_value in assignments:
        pieces = _SUBST.split(raw_value)
        if len(pieces) == 1:
            values[key] = _parse_scalar(raw_value)
            continue
        # interpolate: pieces alternate [text, opt_flag, path, text, ...]
        resolved: list[Any] = []
        missing_optional = False
        i = 0
        while i < len(pieces):
            if i % 3 == 0:
                if pieces[i]:
                    resolved.append(pieces[i])
                i += 1
            else:
                optional, path = pieces[i] == "?", pieces[i + 1]
                if path in values:
                    resolved.append(values[path])
                elif path in os.environ:
                    resolved.append(_parse_scalar(os.environ[path]))
                elif optional:
                    missing_optional = True
                else:
                    raise KeyError(f"unresolved substitution ${{{path}}} for {key}")
                i += 2
        if missing_optional:
            continue  # keep the previous assignment, per ${?x} semantics
        if len(resolved) == 1:
            values[key] = resolved[0]
        else:
            values[key] = "".join(str(r) for r in resolved)
    return values
