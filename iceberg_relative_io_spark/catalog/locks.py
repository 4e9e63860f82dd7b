"""Lock managers for non-atomic-rename object stores.

The reference's commit linchpin is an atomic rename-if-absent; on stores
without one (S3 before conditional writes) it exposes a ``LockManager``
hook so the CAS check + move runs under an external mutex (reference
HadoopRelativeTableOperations.java:346-376 and README.md:123-124, which
document exactly this S3 caveat). This module is the Python counterpart:
a tiny named-lock protocol plus registrable implementations, resolved by
name so ``RelativeFileIO`` stays a picklable plain-data object (executors
re-resolve the lock manager from its name, never pickle live locks).

Implementations:

- ``in-memory`` — process-wide named mutexes. Right for tests and for
  single-driver deployments (every Iceberg-style commit happens on the
  driver; executors never rename metadata).
- ``file`` — atomic ``mkdir``-based lock directories on a shared posix
  scratch path; works across processes on a shared filesystem. A real
  S3 deployment would register a DynamoDB/ZooKeeper-style implementation
  under its own name — the protocol is the integration point, matching
  the reference's pluggable LockManager.
"""

from __future__ import annotations

import os
import threading
import time

_REGISTRY: dict[str, object] = {}


def register_lock_impl(name: str, factory) -> None:
    """Register a lock-manager factory: ``factory(warehouse) -> manager``
    with ``acquire(key) -> bool`` / ``release(key)`` methods."""
    _REGISTRY[name] = factory


def resolve_lock_impl(name: str, warehouse: str):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown lock-impl {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](warehouse)


class InMemoryLockManager:
    """Process-wide named mutexes. acquire() blocks (bounded) until the
    name is free, so a CAS section runs exclusively; the loser then sees
    the winner's committed file and backs off via the exists() check."""

    _global = threading.Lock()
    _held: dict[str, threading.Lock] = {}

    def __init__(self, warehouse: str, timeout: float = 30.0):
        self.warehouse = warehouse
        self.timeout = timeout

    def _named(self, key: str) -> threading.Lock:
        with self._global:
            return self._held.setdefault(key, threading.Lock())

    def acquire(self, key: str) -> bool:
        return self._named(key).acquire(timeout=self.timeout)

    def release(self, key: str) -> None:
        lock = self._named(key)
        if lock.locked():
            lock.release()


class FileLockManager:
    """Cross-process named locks via atomic ``mkdir`` on a scratch dir
    (mkdir either creates or raises — an atomic test-and-set every posix
    and NFS filesystem provides). Stale locks expire after ``ttl``."""

    def __init__(self, warehouse: str, scratch: str | None = None,
                 timeout: float = 30.0, ttl: float = 300.0):
        base = scratch or os.path.join(
            os.environ.get("TMPDIR", "/tmp"), "relative-io-locks"
        )
        os.makedirs(base, exist_ok=True)
        self.base = base
        self.timeout = timeout
        self.ttl = ttl

    def _path(self, key: str) -> str:
        import hashlib

        return os.path.join(
            self.base, hashlib.sha256(key.encode()).hexdigest()[:32] + ".lock"
        )

    def acquire(self, key: str) -> bool:
        path = self._path(key)
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                os.mkdir(path)
                return True
            except FileExistsError:
                try:
                    if time.time() - os.stat(path).st_mtime > self.ttl:
                        os.rmdir(path)  # expire a crashed holder's lock
                        continue
                except OSError:
                    pass
                if time.monotonic() >= deadline:
                    return False
                time.sleep(0.01)

    def release(self, key: str) -> None:
        try:
            os.rmdir(self._path(key))
        except OSError:
            pass


register_lock_impl("in-memory", InMemoryLockManager)
register_lock_impl("file", FileLockManager)
