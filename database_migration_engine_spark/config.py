"""Engine configuration with file → env → flags precedence.

Mirrors the reference's Config and its merge order
(reference internal/config/config.go:12-28,53-133: defaults, then config
file, then MIGRATE_*-style environment variables, then CLI flags — later
layers win). Defaults match the reference's operational constants
(lock_timeout 5s, statement_timeout 30s, target PG 14,
internal/config/config.go:14-16).

The file format is YAML when PyYAML is importable, else JSON (this
container has no YAML library; the search order tries both extensions).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from dataclasses import dataclass

ENV_PREFIX = "MIGRATE_"

try:  # pragma: no cover - environment-dependent
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:
    _HAVE_YAML = False


@dataclass
class Config:
    database_url: str = ""
    migrations_dir: str = "migrations"
    lock_timeout_ms: int = 5_000
    statement_timeout_ms: int = 30_000
    target_pg_version: int = 14
    format: str = "text"  # text | json | github-actions
    ledger_path: str = "schema_migrations"

    _INT_FIELDS = ("lock_timeout_ms", "statement_timeout_ms", "target_pg_version")


def _parse_file(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    if _HAVE_YAML and (path.endswith(".yml") or path.endswith(".yaml")):
        return yaml.safe_load(text) or {}
    return json.loads(text) if text.strip() else {}


def load(
    config_file: str | None = None,
    env: dict[str, str] | None = None,
    flags: dict[str, object] | None = None,
) -> Config:
    """Layered load: defaults ← file ← env (MIGRATE_*) ← flags."""
    cfg = Config()
    values = dataclasses.asdict(cfg)

    if config_file and os.path.exists(config_file):
        for key, value in _parse_file(config_file).items():
            if key in values and value is not None:
                values[key] = value

    env = dict(os.environ if env is None else env)
    for field in list(values):
        env_key = ENV_PREFIX + field.upper()
        if env_key in env and env[env_key] != "":
            values[field] = env[env_key]

    for key, value in (flags or {}).items():
        if key in values and value is not None:
            values[key] = value

    for field in Config._INT_FIELDS:
        values[field] = int(values[field])
    return Config(**values)


def redact_url(url: str) -> str:
    """Replace the password in a connection URL with *** (P6,
    reference internal/config/redact.go:10-52)."""
    return re.sub(r"(://[^:/@]+:)[^@]*@", r"\1***@", url)
