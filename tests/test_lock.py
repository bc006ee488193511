"""Advisory-lock semantics (E12): non-blocking exclusion, idempotent
acquire/release, cross-process refusal — mirroring the reference's
integration coverage (integration/advisory_lock_test.go:15-87 and the
2-process race in lifecycle_test.go)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from database_migration_engine_spark.executor.lock import (
    AdvisoryFileLock,
    LockNotAcquiredError,
)


def test_acquire_release_cycle(tmp_path):
    lock = AdvisoryFileLock(str(tmp_path / "ledger"))
    lock.acquire()
    assert lock.held
    lock.release()
    assert not lock.held
    lock.acquire()  # re-acquirable after release
    lock.release()


def test_idempotent_acquire_and_release(tmp_path):
    lock = AdvisoryFileLock(str(tmp_path / "ledger"))
    lock.acquire()
    lock.acquire()  # no-op, no error
    lock.release()
    lock.release()  # no-op, no error


def test_second_holder_refused(tmp_path):
    path = str(tmp_path / "ledger")
    first = AdvisoryFileLock(path)
    second = AdvisoryFileLock(path)
    first.acquire()
    with pytest.raises(LockNotAcquiredError):
        second.acquire()
    first.release()
    second.acquire()  # freed → acquirable
    second.release()


def test_cross_process_exclusion(tmp_path):
    """A second OS process must be refused while we hold the lock, and
    succeed after release."""
    path = str(tmp_path / "ledger")
    probe = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from database_migration_engine_spark.executor.lock import (
            AdvisoryFileLock, LockNotAcquiredError)
        try:
            AdvisoryFileLock({path!r}).acquire()
            print("ACQUIRED")
        except LockNotAcquiredError:
            print("REFUSED")
        """
    )
    lock = AdvisoryFileLock(path)
    lock.acquire()
    held = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True
    )
    assert held.stdout.strip() == "REFUSED"
    lock.release()
    free = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True
    )
    assert free.stdout.strip() == "ACQUIRED"


def test_context_manager(tmp_path):
    path = str(tmp_path / "ledger")
    with AdvisoryFileLock(path) as lock:
        assert lock.held
        with pytest.raises(LockNotAcquiredError):
            AdvisoryFileLock(path).acquire()
    AdvisoryFileLock(path).acquire()  # released on exit
