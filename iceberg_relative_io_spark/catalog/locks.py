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
    the winner's committed file and backs off via the exists() check.

    Entries are REFCOUNTED (commit keys are versioned metadata paths —
    a fresh key per commit — so an unpruned dict grows one Lock per
    commit forever) and release() is OWNER-CHECKED: ``lock.locked()``
    is true while ANY thread holds it, so an unpaired release from a
    non-owner used to free someone else's critical section."""

    _global = threading.Lock()
    _held: dict[str, list] = {}  # key -> [lock, refcount, owner_ident]

    def __init__(self, warehouse: str, timeout: float = 30.0):
        self.warehouse = warehouse
        self.timeout = timeout

    def acquire(self, key: str) -> bool:
        with self._global:
            ent = self._held.setdefault(key, [threading.Lock(), 0, None])
            ent[1] += 1
        ok = ent[0].acquire(timeout=self.timeout)
        if ok:
            ent[2] = threading.get_ident()
        else:
            self._unref(key)
        return ok

    def _unref(self, key: str) -> None:
        with self._global:
            ent = self._held.get(key)
            if ent is None:
                return
            ent[1] -= 1
            if ent[1] <= 0:
                del self._held[key]

    def release(self, key: str) -> None:
        with self._global:
            ent = self._held.get(key)
        if ent is None or ent[2] != threading.get_ident():
            return  # not the owner: must not break the holder's mutex
        ent[2] = None
        ent[0].release()
        self._unref(key)


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
            except FileExistsError:
                self._maybe_expire(path)
                if time.monotonic() >= deadline:
                    return False
                time.sleep(0.01)
                continue
            try:
                # ownership stamp: the liveness signal expiry checks
                with open(os.path.join(path, "owner"), "w") as fh:
                    fh.write(f"{os.getpid()}:{time.time()}")
            except OSError:
                continue  # dir vanished under us: lost a race, re-probe
            return True

    def _age(self, path: str) -> float:
        """Age of the lock: the owner stamp's mtime, else the dir's own
        (covers legacy stamp-less dirs and the instant between a
        winner's mkdir and its stamp)."""
        try:
            return time.time() - os.stat(os.path.join(path, "owner")).st_mtime
        except OSError:
            return time.time() - os.stat(path).st_mtime

    def _maybe_expire(self, path: str) -> None:
        """TTL expiry without the stat/rmdir TOCTOU: the old
        check-then-rmdir let a waiter delete a lock that a NEW holder
        had just re-created (two holders at once — the exact failure
        the mutex exists to prevent). Now a single expirer CLAIMS the
        stale dir by creating an O_EXCL marker inside it, RE-VERIFIES
        staleness through the owner stamp after the claim (a fresh dir
        re-created in the window stamps within microseconds and is left
        alone; missing-stamp gets a short grace, then counts as a
        pre-stamp crash), and only then reaps."""
        try:
            if self._age(path) <= self.ttl:  # pre-claim verdict
                return
            claim = os.path.join(path, "expiring")
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            try:
                # re-verify via the STAMP only (creating the claim just
                # bumped the dir mtime, so dir age is now meaningless)
                owner = os.path.join(path, "owner")
                for _ in range(2):
                    try:
                        if time.time() - os.stat(owner).st_mtime <= self.ttl:
                            return  # re-created fresh: leave it alone
                        break  # stamped and stale: reap
                    except OSError:
                        time.sleep(0.05)  # grace for a winner mid-stamp
                import shutil

                shutil.rmtree(path, ignore_errors=True)
            finally:
                try:
                    os.unlink(claim)
                except OSError:
                    pass
        except OSError:
            pass  # lost an expiry race: the next loop iteration re-probes

    def release(self, key: str) -> None:
        import shutil

        shutil.rmtree(self._path(key), ignore_errors=True)


register_lock_impl("in-memory", InMemoryLockManager)
register_lock_impl("file", FileLockManager)
