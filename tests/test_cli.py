"""CLI command tests (reference internal/cli/apply_test.go,
analyze_test.go per SURVEY.md §5): gate blocks dangerous dirs, exit codes,
output formats — driving cmd_* with the shared session."""

from __future__ import annotations

import argparse
import json

import pytest

from database_migration_engine_spark import cli
from database_migration_engine_spark import config as cfg


@pytest.fixture()
def migdir(tmp_path):
    d = tmp_path / "migs"
    d.mkdir()
    (d / "V001_safe_create.up.sql").write_text(
        "CREATE TABLE users (id BIGSERIAL PRIMARY KEY);"
    )
    (d / "V001_safe_create.down.sql").write_text("DROP TABLE IF EXISTS users;")
    (d / "V002_dangerous_index.up.sql").write_text(
        "CREATE INDEX idx ON users (id);"
    )
    (d / "V002_dangerous_index.down.sql").write_text(
        "DROP INDEX IF EXISTS idx;"
    )
    return d


def _conf(migdir, tmp_path, **kw):
    return cfg.Config(
        migrations_dir=str(migdir),
        ledger_path=str(tmp_path / "ledger"),
        **kw,
    )


def _args(**kw):
    return argparse.Namespace(**kw)


def test_analyze_exit_codes(spark, migdir, tmp_path, capsys):
    conf = _conf(migdir, tmp_path)
    assert cli.cmd_analyze(spark, conf, _args(fail_on_high=False)) == 0
    assert cli.cmd_analyze(spark, conf, _args(fail_on_high=True)) == 1
    out = capsys.readouterr().out
    assert "create-index-not-concurrent" in out
    assert "2 migrations, 1 findings, 1 with HIGH/CRITICAL" in out


def test_analyze_json_format(spark, migdir, tmp_path, capsys):
    conf = _conf(migdir, tmp_path, format="json")
    cli.cmd_analyze(spark, conf, _args(fail_on_high=False))
    payload = json.loads(capsys.readouterr().out)
    assert payload[0]["rule"] == "create-index-not-concurrent"
    assert payload[0]["version"] == "002"


def test_analyze_github_actions_format(spark, migdir, tmp_path, capsys):
    """--format github-actions emits one workflow-command annotation per
    finding (reference internal/cli/analyze.go:24 declares the format):
    ::error for HIGH/CRITICAL, file= pointing at the offending .up.sql,
    escaped message text."""
    conf = _conf(migdir, tmp_path, format="github-actions")
    rc = cli.cmd_analyze(spark, conf, _args(fail_on_high=False))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # one finding in the fixture
    line = out[0]
    assert line.startswith("::error ")
    assert "file=" in line and "V002_dangerous_index.up.sql" in line
    assert "title=create-index-not-concurrent (HIGH)" in line
    assert "::CREATE INDEX" in line and "Suggestion" in line


def test_analyze_github_actions_severity_levels_and_escaping(
    spark, tmp_path, capsys
):
    """MEDIUM findings map to ::warning, and commas/colons in property
    values are %-escaped per the workflow-command spec."""
    d = tmp_path / "migs2"
    d.mkdir()
    (d / "V001_rename, odd.up.sql").write_text(
        "ALTER TABLE users RENAME COLUMN a TO b;"
    )
    (d / "V001_rename, odd.down.sql").write_text(
        "ALTER TABLE users RENAME COLUMN b TO a;"
    )
    conf = _conf(d, tmp_path, format="github-actions")
    assert cli.cmd_analyze(spark, conf, _args(fail_on_high=False)) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert out[0].startswith("::warning ")  # rename is MEDIUM severity
    assert "%2C" in out[0]  # the comma in the filename is escaped


def test_apply_gate_blocks_then_force(spark, migdir, tmp_path, capsys):
    conf = _conf(migdir, tmp_path)
    blocked = cli.cmd_apply(
        spark, conf, _args(dry_run=False, force=False, echo=True)
    )
    assert blocked == 1
    ok = cli.cmd_apply(
        spark, conf, _args(dry_run=False, force=True, echo=True)
    )
    assert ok == 0
    assert "applied 2, skipped 0" in capsys.readouterr().out


def test_status_and_plan(spark, migdir, tmp_path, capsys):
    conf = _conf(migdir, tmp_path)
    cli.cmd_apply(spark, conf, _args(dry_run=False, force=True, echo=True))
    capsys.readouterr()
    assert cli.cmd_status(spark, conf, _args()) == 0
    out = capsys.readouterr().out
    assert "applied (2):" in out and "pending (0):" in out
    assert cli.cmd_plan(spark, conf, _args()) == 0
    out = capsys.readouterr().out
    assert "V001 safe_create: SAFE" in out
    assert "V002 dangerous_index: HIGH; locks: SHARE" in out


def test_rollback_command(spark, migdir, tmp_path, capsys):
    conf = _conf(migdir, tmp_path)
    cli.cmd_apply(spark, conf, _args(dry_run=False, force=True, echo=True))
    assert (
        cli.cmd_rollback(spark, conf, _args(steps=1, target=None, echo=True))
        == 0
    )
    capsys.readouterr()
    cli.cmd_status(spark, conf, _args())
    out = capsys.readouterr().out
    assert "applied (1):" in out and "pending (1):" in out


# --- r03 CLI parity additions ----------------------------------------------


def test_duration_flag_parsing():
    """Go-style duration strings (reference apply.go:41-42 Duration
    flags) → milliseconds."""
    assert cli._duration_ms("500ms") == 500
    assert cli._duration_ms("10s") == 10_000
    assert cli._duration_ms("1m") == 60_000
    assert cli._duration_ms("2h") == 7_200_000
    assert cli._duration_ms("1.5s") == 1500
    assert cli._duration_ms("250") == 250  # bare integer = ms
    import argparse as _ap

    with pytest.raises(_ap.ArgumentTypeError):
        cli._duration_ms("10 parsecs")


def test_apply_timeout_overrides_reach_config(migdir, tmp_path):
    args = cli._parser().parse_args([
        "--ledger-path", str(tmp_path / "l"),
        "apply", str(migdir),
        "--lock-timeout", "7s", "--statement-timeout", "90s", "--echo",
    ])
    conf = cli._load_cfg(args)
    assert conf.lock_timeout_ms == 7_000
    assert conf.statement_timeout_ms == 90_000


def test_migrations_dir_flag_and_positional_precedence(migdir, tmp_path):
    args = cli._parser().parse_args([
        "--migrations-dir", str(migdir),
        "--ledger-path", str(tmp_path / "l"),
        "status",
    ])
    assert cli._load_cfg(args).migrations_dir == str(migdir)
    args = cli._parser().parse_args([
        "--migrations-dir", "/nonexistent",
        "--ledger-path", str(tmp_path / "l"),
        "status", str(migdir),
    ])
    assert cli._load_cfg(args).migrations_dir == str(migdir)


def test_plan_pending_only(spark, migdir, tmp_path, capsys):
    """plan --pending-only hides applied migrations (reference
    internal/cli/plan.go:18)."""
    conf = _conf(migdir, tmp_path)
    # apply V001 only (force past the V002 danger gate not needed: apply
    # all with force in echo mode, then roll back V002's ledger row by
    # re-creating a ledger with only V001... simplest: apply everything)
    rc = cli.cmd_apply(
        spark, conf, _args(dry_run=False, force=True, echo=True,
                           lock_timeout=None, statement_timeout=None)
    )
    assert rc == 0
    capsys.readouterr()
    rc = cli.cmd_plan(spark, conf, _args(pending_only=True))
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""  # everything applied
    rc = cli.cmd_plan(spark, conf, _args(pending_only=False))
    assert rc == 0
    out = capsys.readouterr().out
    assert "V001" in out and "V002" in out
