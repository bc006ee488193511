"""CLI — the product surface of the migration engine.

Command set mirrors the reference CLI (reference internal/cli/): analyze,
apply (danger gate, --dry-run, --force), rollback (--steps | --target,
mutually exclusive per internal/cli/rollback.go:28), status. ``plan`` —
never built in the reference (internal/cli/plan.go:22-26) — is implemented
here as a real impact preview (per-migration findings + lock types).

Flag precedence follows config.load (file → MIGRATE_* env → flags).
Without --database-url, apply/rollback require --echo (record-only mode,
no SQL leaves the process) so nothing destructive can happen by accident.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

from pyspark.sql import functions as F

from . import config as cfg
from .analyzer.analyze import analyze, severity_rollup
from .analyzer.rules import SEVERITY_NAMES
from .executor.lock import LockNotAcquiredError
from .executor.orchestrator import (
    CollectingRunner,
    DangerousMigrationsError,
    Executor,
    JdbcRunner,
    MigrationError,
    ParquetLedger,
    PsqlRunner,
)
from .session import build_session
from .sources.migrations import load_from_dir


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="database-migration-engine-spark",
        description="PySpark-native zero-downtime migration engine",
    )
    p.add_argument("--config", help="config file (yaml/json)")
    p.add_argument("--database-url")
    p.add_argument("--migrations-dir",
                   help="path to migration files (reference root flag;"
                        " the positional dir takes precedence)")
    p.add_argument("--ledger-path")
    p.add_argument("--pg-version", type=int, dest="target_pg_version")
    p.add_argument("--format", choices=["text", "json", "github-actions"])
    p.add_argument("--verbose", action="store_true",
                   help="enable verbose output (Spark INFO logs + SQL echo)")
    sub = p.add_subparsers(dest="command", required=True)

    an = sub.add_parser("analyze", help="danger-analyze a migrations dir")
    an.add_argument("dir", nargs="?")
    an.add_argument("--fail-on-high", action="store_true")

    ap = sub.add_parser("apply", help="apply pending migrations in order")
    ap.add_argument("dir", nargs="?")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--echo", action="store_true",
                    help="record-only mode (no database needed)")
    ap.add_argument("--lock-timeout", type=_duration_ms, default=None,
                    help="override lock timeout (e.g. 10s, 1m, 500ms)")
    ap.add_argument("--statement-timeout", type=_duration_ms, default=None,
                    help="override statement timeout (e.g. 30s, 5m)")

    rb = sub.add_parser("rollback", help="roll back applied migrations")
    rb.add_argument("dir", nargs="?")
    group = rb.add_mutually_exclusive_group(required=True)
    group.add_argument("--steps", type=int)
    group.add_argument("--target")
    rb.add_argument("--echo", action="store_true")

    st = sub.add_parser("status", help="ledger + pending summary")
    st.add_argument("dir", nargs="?")

    pl = sub.add_parser("plan", help="impact preview (reference stub, real here)")
    pl.add_argument("dir", nargs="?")
    pl.add_argument("--pending-only", action="store_true",
                    help="show only migrations not yet in the ledger")
    return p


_DURATION_UNITS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}


def _duration_ms(raw: str) -> int:
    """Go-style duration string → milliseconds (the reference's apply
    overrides are cobra Duration flags, reference internal/cli/apply.go:
    41-42): '500ms', '10s', '1m', '2h', or a bare integer (ms)."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)?", raw.strip())
    if not m:
        raise argparse.ArgumentTypeError(
            f"invalid duration {raw!r} (want e.g. 500ms, 10s, 1m)"
        )
    return int(float(m.group(1)) * _DURATION_UNITS[m.group(2) or "ms"])


def _load_cfg(args: argparse.Namespace) -> cfg.Config:
    flags = {
        "database_url": args.database_url,
        "ledger_path": args.ledger_path,
        "target_pg_version": args.target_pg_version,
        "format": args.format,
    }
    # positional dir > --migrations-dir flag > env/file (reference
    # precedence: args[0] over the persistent flag)
    if getattr(args, "dir", None):
        flags["migrations_dir"] = args.dir
    elif getattr(args, "migrations_dir", None):
        flags["migrations_dir"] = args.migrations_dir
    if getattr(args, "lock_timeout", None) is not None:
        flags["lock_timeout_ms"] = args.lock_timeout
    if getattr(args, "statement_timeout", None) is not None:
        flags["statement_timeout_ms"] = args.statement_timeout
    return cfg.load(config_file=args.config, flags=flags)


def _executor(spark, conf: cfg.Config, echo: bool) -> Executor:
    if conf.database_url:
        if conf.database_url.startswith(("postgresql://", "postgres://")):
            # native PG URI → psql client runner (no JDBC jar needed);
            # psql accepts the URI verbatim as its conninfo argument
            runner = PsqlRunner(
                [conf.database_url],
                lock_timeout_ms=conf.lock_timeout_ms,
                statement_timeout_ms=conf.statement_timeout_ms,
            )
        else:
            # JDBC URL. PG is the product target (reference parity);
            # embedded Derby is the in-process test endpoint and rejects
            # PG's SET *_timeout syntax, so its session-init list is
            # empty (E7 timeouts are a PG-dialect safety feature).
            session_init = (
                [] if conf.database_url.startswith("jdbc:derby:") else None
            )
            runner = JdbcRunner(
                spark,
                conf.database_url,
                lock_timeout_ms=conf.lock_timeout_ms,
                statement_timeout_ms=conf.statement_timeout_ms,
                session_init=session_init,
            )
        print(f"database: {cfg.redact_url(conf.database_url)}")
    elif echo:
        runner = CollectingRunner()
        print("echo mode: SQL recorded, not executed")
    else:
        print("error: no --database-url (use --echo for record-only mode)",
              file=sys.stderr)
        raise SystemExit(2)
    return Executor(
        ledger=ParquetLedger(spark, conf.ledger_path),
        runner=runner,
        pg_version=conf.target_pg_version,
        progress=lambda e: print(
            f"  [{e.status}] V{e.version} {e.name}"
            + (f" ({e.duration_ms}ms)" if e.status == "completed" else "")
            + (f": {e.error}" if e.error else "")
        ),
    )


def _gha_escape(s: str, *, property_value: bool = False) -> str:
    """GitHub Actions workflow-command escaping: %, CR, LF always;
    property values additionally escape ':' and ','."""
    s = s.replace("%", "%25").replace("\r", "%0D").replace("\n", "%0A")
    if property_value:
        s = s.replace(":", "%3A").replace(",", "%2C")
    return s


def _print_github_actions(rows, file_by_version: dict[str, str]) -> None:
    """One workflow-command annotation per finding
    (``::error file=...,title=...::message``), the format the reference
    CLI declares for CI use (reference internal/cli/analyze.go:24).
    HIGH/CRITICAL → error, MEDIUM → warning, lower → notice."""
    for r in rows:
        level = (
            "error" if r.severity >= 3
            else "warning" if r.severity == 2
            else "notice"
        )
        props = []
        fp = file_by_version.get(r.version)
        if fp:
            props.append(f"file={_gha_escape(fp, property_value=True)}")
        props.append(
            "title="
            + _gha_escape(f"{r.rule} ({r.severity_name})", property_value=True)
        )
        msg = _gha_escape(f"{r.message}. Suggestion: {r.suggestion}")
        print(f"::{level} {','.join(props)}::{msg}")


def cmd_analyze(spark, conf: cfg.Config, args) -> int:
    migs = load_from_dir(spark, conf.migrations_dir)
    findings = analyze(migs, pg_version=conf.target_pg_version)
    rollup = severity_rollup(migs, findings=findings).collect()
    rows = findings.orderBy("version", "stmt_index").collect()
    if conf.format == "json":
        print(json.dumps([r.asDict() for r in rows], default=str, indent=2))
    elif conf.format == "github-actions":
        file_by_version = {
            m.version: m.file_path
            for m in migs.select("version", "file_path").collect()
        }
        _print_github_actions(rows, file_by_version)
    else:
        for r in rows:
            print(f"V{r.version} [{r.severity_name}] {r.rule} on {r.table}:"
                  f" {r.message}")
            print(f"    suggestion: {r.suggestion}")
        n_dangerous = sum(1 for r in rollup if r.has_high_or_critical)
        print(f"{len(rollup)} migrations, {len(rows)} findings,"
              f" {n_dangerous} with HIGH/CRITICAL")
    if args.fail_on_high and any(r.has_high_or_critical for r in rollup):
        return 1
    return 0


def cmd_apply(spark, conf: cfg.Config, args) -> int:
    migs = load_from_dir(spark, conf.migrations_dir)
    ex = _executor(spark, conf, args.echo)
    try:
        ex.apply(migs, dry_run=args.dry_run, force=args.force)
    except DangerousMigrationsError as exc:
        print(f"blocked: {exc}", file=sys.stderr)
        return 1
    done = sum(1 for e in ex.events if e.status == "completed")
    skipped = sum(1 for e in ex.events if e.status == "skipped")
    print(f"applied {done}, skipped {skipped}"
          + (" (dry run)" if args.dry_run else ""))
    return 0


def cmd_rollback(spark, conf: cfg.Config, args) -> int:
    migs = load_from_dir(spark, conf.migrations_dir)
    ex = _executor(spark, conf, args.echo)
    if args.target is not None:
        ex.rollback_to_version(migs, args.target)
    else:
        ex.rollback(migs, steps=args.steps)
    done = sum(1 for e in ex.events if e.status == "completed")
    print(f"rolled back {done}")
    return 0


def cmd_status(spark, conf: cfg.Config, args) -> int:
    ledger = ParquetLedger(spark, conf.ledger_path)
    ledger.ensure()
    applied = ledger.applied().collect()
    try:
        migs = load_from_dir(spark, conf.migrations_dir)
        pending_rows = True
    except Exception:
        print(f"(migrations dir {conf.migrations_dir!r} not readable;"
              f" showing ledger only)")
        migs = None
        pending_rows = False
    if not pending_rows:
        print(f"applied ({len(applied)}):")
        for r in applied:
            print(f"  V{r.version} {r.filename} at {r.applied_at}"
                  f" [{r.duration_ms}ms]")
        return 0
    pending = (
        migs.join(
            ledger.df().filter(F.col("status") == "applied"),
            "version",
            "left_anti",
        )
        .orderBy("version")
        .collect()
    )
    print(f"applied ({len(applied)}):")
    for r in applied:
        print(f"  V{r.version} {r.filename} at {r.applied_at}"
              f" [{r.duration_ms}ms]")
    print(f"pending ({len(pending)}):")
    for r in pending:
        print(f"  V{r.version} {r.name}")
    return 0


def cmd_plan(spark, conf: cfg.Config, args) -> int:
    migs = load_from_dir(spark, conf.migrations_dir)
    if getattr(args, "pending_only", False):
        # reference plan --pending-only (internal/cli/plan.go:18): keep
        # only migrations not yet applied in the ledger
        ledger = ParquetLedger(spark, conf.ledger_path)
        ledger.ensure()
        migs = migs.join(
            ledger.df().filter(F.col("status") == "applied"),
            "version",
            "left_anti",
        )
    findings = analyze(migs, pg_version=conf.target_pg_version).collect()
    by_version: dict[str, list] = {}
    for r in findings:
        by_version.setdefault(r.version, []).append(r)
    for m in migs.orderBy("version").collect():
        fs = by_version.get(m.version, [])
        if not fs:
            print(f"V{m.version} {m.name}: SAFE, no exclusive locks expected")
            continue
        worst = max(f.severity for f in fs)
        locks = sorted({f.lock_type for f in fs})
        print(f"V{m.version} {m.name}: {SEVERITY_NAMES[worst]};"
              f" locks: {', '.join(locks)};"
              f" {len(fs)} finding(s)")
    return 0


COMMANDS = {
    "analyze": cmd_analyze,
    "apply": cmd_apply,
    "rollback": cmd_rollback,
    "status": cmd_status,
    "plan": cmd_plan,
}


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    conf = _load_cfg(args)
    spark = build_session(app_name=f"dbme-{args.command}")
    spark.sparkContext.setLogLevel(
        "INFO" if getattr(args, "verbose", False) else "ERROR"
    )
    try:
        return COMMANDS[args.command](spark, conf, args)
    except LockNotAcquiredError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 3
    except MigrationError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
