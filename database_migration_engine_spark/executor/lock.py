"""Cross-process mutual exclusion for the apply/rollback loop (E12).

The reference takes ``pg_try_advisory_lock(123456789)`` on a dedicated
connection — non-blocking, error if held, idempotent release
(reference internal/database/advisory_lock.go:12,25-65). Spark has no
cluster primitive for this; for a shared-filesystem ledger the same
semantics come from an OS advisory file lock next to the ledger:
try-acquire (non-blocking), LockNotAcquiredError when another process
holds it, idempotent release, auto-release on process death (the property
that makes advisory locks operationally safe).

On object stores without flock semantics, replace with a fencing token in
the ledger itself or an external lock service — the Executor only needs
this try/release interface.
"""

from __future__ import annotations

import fcntl
import os

MIGRATION_LOCK_ID = 123456789  # reference internal/database/advisory_lock.go:12


class LockNotAcquiredError(Exception):
    """Another migration run holds the lock
    (reference ErrLockNotAcquired, internal/database/advisory_lock.go)."""


class AdvisoryFileLock:
    """Non-blocking exclusive lock on ``<path>.lock.<id>``."""

    def __init__(self, path: str, lock_id: int = MIGRATION_LOCK_ID):
        self.lock_path = f"{path}.lock.{lock_id}"
        self._fd: int | None = None

    @property
    def held(self) -> bool:
        return self._fd is not None

    def acquire(self) -> None:
        if self._fd is not None:  # idempotent re-acquire
            return
        fd = os.open(self.lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            raise LockNotAcquiredError(
                f"migration lock {self.lock_path} is held by another process"
            ) from None
        os.write(fd, str(os.getpid()).encode())
        self._fd = fd

    def release(self) -> None:
        if self._fd is None:  # idempotent release (reference :55-65)
            return
        fcntl.flock(self._fd, fcntl.LOCK_UN)
        os.close(self._fd)
        self._fd = None

    def __enter__(self) -> AdvisoryFileLock:
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
