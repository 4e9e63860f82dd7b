"""JdbcCatalog — SQL-backed catalog with relative locations (any DB-API).

Python re-expression of the reference's ``JdbcRelativeCatalog`` (reference
JdbcRelativeCatalog.java:61-692): the catalog state (tables, namespaces,
views) lives in an RDBMS while data/metadata files flow through the same
relativizing IO. Differences from the FS catalog mirror the reference:

- table rename IS supported (SQL UPDATE, reference :245-284) — the FS
  catalog refuses it,
- namespaces are rows in a properties table with the reserved
  ``exists=true`` marker (reference :53, :302-310), can carry metadata,
  and refuse to drop while non-empty (reference :394-397),
- views (schema V1) get full CRUD (reference :51-52, :475-547),
- the current-metadata pointer lives in the DB row and commits are a SQL
  compare-and-swap (reference newTableOps -> JdbcTableOperations,
  :190-193) — no filesystem rename needed.

The backend is a pluggable DB-API driver (sqlite default, DuckDB as the
proving second engine, anything else injectable — see register_db_driver);
every statement is parameterized exactly as the reference's prepared
statements (:549-599).
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time
import uuid

from iceberg_relative_io_spark.catalog.fileio import RelativeFileIO
from iceberg_relative_io_spark.catalog.table_ops import (
    CommitFailedError,
    NoSuchTableError,
    new_table_metadata,
)

_CATALOG_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
    catalog_name TEXT NOT NULL,
    table_namespace TEXT NOT NULL,
    table_name TEXT NOT NULL,
    metadata_location TEXT,
    previous_metadata_location TEXT,
    record_type TEXT NOT NULL DEFAULT 'TABLE',
    PRIMARY KEY (catalog_name, table_namespace, table_name)
)
"""
_NAMESPACE_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (
    catalog_name TEXT NOT NULL,
    namespace TEXT NOT NULL,
    property_key TEXT NOT NULL,
    property_value TEXT,
    PRIMARY KEY (catalog_name, namespace, property_key)
)
"""
_NAMESPACE_EXISTS_PROP = "exists"  # reserved marker (reference :53)


# ---------------------------------------------------------------------------
# DB-API driver plugability — parity with the reference's JdbcClientPool:
# the reference takes ANY JDBC URI and builds a pooled client from it
# (JdbcRelativeCatalog.java:80-84, 100-104); the catalog SQL itself is
# engine-portable. Here the same split: JdbcCatalog speaks plain
# qmark-parameterized SQL, and a small driver object supplies the three
# things DB-API modules genuinely differ on — how to connect, which
# exception signals a unique-key violation (the CAS/create conflict
# signal), and how to count affected rows (sqlite exposes cursor.rowcount;
# DuckDB returns a count row from UPDATE/DELETE). A second real backend
# (DuckDB) runs the full CRUD/CAS/view/migration suite in
# tests/test_catalog.py, proving the SQL is portable, and any DB-API
# driver can be registered or injected without touching catalog code.
# ---------------------------------------------------------------------------


class SqliteDriver:
    name = "sqlite"
    # server/shared-file engines benefit from connection reuse (the
    # reference's JdbcClientPool role); sqlite's file lock is per-txn,
    # so held connections coexist across catalog instances
    poolable = True
    # ALTER ... ADD COLUMN accepts inline constraints on sqlite
    migrate_v1_sql = (
        "ALTER TABLE iceberg_tables ADD COLUMN record_type TEXT NOT NULL DEFAULT 'TABLE'"
    )

    @property
    def integrity_errors(self) -> tuple:
        return (sqlite3.IntegrityError,)

    def connect(self, db_path: str):
        # the pool hands one connection to one transaction at a time,
        # possibly on different threads — safe without the same-thread
        # guard because the txn scope serializes access
        return sqlite3.connect(db_path, check_same_thread=False)

    @staticmethod
    def end_txn(con, ok: bool) -> None:
        (con.commit if ok else con.rollback)()

    @staticmethod
    def changes(cur) -> int:
        return cur.rowcount


class DuckDbDriver:
    name = "duckdb"
    # Pooled since round 9: a COLD duckdb file connect costs ~15ms
    # (open + WAL replay), and the round-8 connect-per-transaction
    # choice put that on every catalog statement — measured as the
    # b04_sql_views 1.0s→3.3s bench regression. Held connections are
    # safe in-process: the duckdb Python module caches one database
    # instance per path, so other catalog instances on the same file
    # coexist with the pool (verified: a second connect while one is
    # held reads the first's commits). Cross-PROCESS concurrent access
    # to one duckdb file is unsupported by duckdb itself regardless of
    # pooling. Statements are autocommit by default, so the pool's txn
    # scope opens an explicit transaction via the begin() hook.
    poolable = True
    # DuckDB can't ADD COLUMN with constraints; DEFAULT backfills rows
    migrate_v1_sql = (
        "ALTER TABLE iceberg_tables ADD COLUMN record_type TEXT DEFAULT 'TABLE'"
    )

    @property
    def integrity_errors(self) -> tuple:
        import duckdb

        return (duckdb.ConstraintException,)

    def connect(self, db_path: str):
        import duckdb

        return duckdb.connect(db_path)

    @staticmethod
    def begin(con) -> None:
        con.execute("BEGIN TRANSACTION")

    @staticmethod
    def end_txn(con, ok: bool) -> None:
        # an error inside the txn leaves it aborted; both catalog catch
        # sites re-raise, so the ok=False ROLLBACK path (valid on an
        # aborted duckdb txn) is the only one that can follow an error
        con.execute("COMMIT" if ok else "ROLLBACK")

    @staticmethod
    def changes(cur) -> int:
        # UPDATE/DELETE surface the affected count as a one-row result
        row = cur.fetchone()
        return int(row[0]) if row else 0


_DB_DRIVERS: dict[str, object] = {
    "sqlite": SqliteDriver,
    "duckdb": DuckDbDriver,
}


def register_db_driver(name: str, driver_cls) -> None:
    """Register a DB-API driver class under a name (the injection point
    the reference's uri->client-pool mapping provides)."""
    _DB_DRIVERS[name] = driver_cls


def resolve_db_driver(driver):
    """Name, class, or instance -> driver instance."""
    if isinstance(driver, str):
        if driver not in _DB_DRIVERS:
            raise KeyError(
                f"unknown db driver {driver!r}; registered: {sorted(_DB_DRIVERS)}"
            )
        driver = _DB_DRIVERS[driver]
    return driver() if isinstance(driver, type) else driver

# V0 -> V1 in-place upgrade (reference updateSchemaIfRequired,
# JdbcRelativeCatalog.java:157-188): V0 predates views and has no
# record_type column; the upgrade adds it, defaulting every existing row
# to TABLE — exactly what V0 rows were.


def _ns_str(namespace) -> str:
    return "/".join(namespace)  # slash-joined like the reference (:55)


class _PooledTxn:
    """One transaction over a pooled connection (the reference builds a
    JdbcClientPool and runs each catalog op on a leased client,
    JdbcRelativeCatalog.java:100-104). ``__enter__`` leases a connection
    (reusing an idle one, else connecting); ``__exit__`` commits on
    success / rolls back on error and returns the connection to the
    pool — never closing it mid-life, so a catalog against a server
    RDBMS pays the TCP+auth handshake once, not per statement.
    ``JdbcCatalog.close()`` drains the pool."""

    def __init__(self, catalog: "JdbcCatalog"):
        self.catalog = catalog
        self.con = None

    def __enter__(self):
        cat = self.catalog
        with cat._pool_lock:
            if cat._closed:
                raise ValueError(f"catalog {cat.name!r} is closed")
            from_pool = bool(cat._pool)
            self.con = (
                cat._pool.pop()
                if cat._pool
                else cat._driver.connect(cat.db_path)
            )
        begin = getattr(cat._driver, "begin", None)
        if begin is not None:  # autocommit engines need an explicit txn
            try:
                begin(self.con)
            except Exception:
                # a pooled connection can go stale between leases (a
                # server RDBMS drops idle sessions); the reference's
                # JdbcClientPool re-validates on lease, so mirror it:
                # discard the stale lease and retry ONCE on a fresh
                # connect — a second failure is a real outage, propagate
                try:
                    self.con.close()
                except Exception:
                    pass
                self.con = None
                if not from_pool:
                    raise
                # the retry connect re-acquires the pool lock and
                # re-checks closed, mirroring the initial lease path —
                # otherwise a concurrent close() could race the retry
                # and leak the fresh connection past pool teardown
                with cat._pool_lock:
                    if cat._closed:
                        raise ValueError(f"catalog {cat.name!r} is closed")
                    con = cat._driver.connect(cat.db_path)
                try:
                    begin(con)
                except Exception:
                    try:
                        con.close()
                    except Exception:
                        pass
                    raise
                self.con = con
        return self.con

    def __exit__(self, exc_type, exc, tb) -> bool:
        cat, con = self.catalog, self.con
        ended = False
        try:
            cat._driver.end_txn(con, exc_type is None)
            ended = True
        finally:
            # a connection whose commit/rollback itself FAILED may hold a
            # half-applied open transaction; pooling it would let the next
            # lease commit this op's writes along with its own (a CAS
            # reported failed becoming half-applied). Failed-end
            # connections are closed, never pooled.
            with cat._pool_lock:
                if not ended or cat._closed or len(cat._pool) >= cat._POOL_MAX:
                    try:
                        con.close()
                    except Exception:
                        pass
                else:
                    cat._pool.append(con)
        return False


class JdbcTableOperations:
    """Pointer-in-DB table operations: metadata JSON documents still live
    in the warehouse (written through the relativizing IO), but 'current'
    is the DB row and commit is a SQL CAS."""

    def __init__(self, catalog: "JdbcCatalog", namespace, name: str):
        self.catalog = catalog
        self.io = catalog.io
        self.namespace = tuple(namespace)
        self.name = name
        self.location = catalog.default_warehouse_location(namespace, name)

    @property
    def metadata_dir(self) -> str:
        return f"{self.location}/metadata"

    def data_location(self, filename: str) -> str:
        return f"{self.location}/data/{filename}"

    def _pointer(self) -> str | None:
        row = self.catalog._fetchone(
            "SELECT metadata_location FROM iceberg_tables WHERE catalog_name=? "
            "AND table_namespace=? AND table_name=?" + self.catalog._t,
            (self.catalog.name, _ns_str(self.namespace), self.name),
        )
        return row[0] if row else None

    def current(self) -> dict:
        ptr = self._pointer()
        if ptr is None:
            raise NoSuchTableError(f"no such table {self.location}")
        return json.loads(self.io.read_bytes(ptr))

    def current_version(self) -> str | None:
        return self._pointer()

    def commit(self, base_pointer: str | None, metadata: dict) -> str:
        """SQL compare-and-swap on the metadata pointer."""
        new_loc = f"{self.metadata_dir}/{uuid.uuid4()}.metadata.json"
        self.io.write_bytes(new_loc, json.dumps(metadata, indent=1).encode())
        with self.catalog._conn() as con:
            if base_pointer is None:
                try:
                    if self.catalog.schema_version == "V1":
                        ins = (
                            "INSERT INTO iceberg_tables (catalog_name, table_namespace, "
                            "table_name, metadata_location, record_type) VALUES (?,?,?,?,'TABLE')"
                        )
                    else:
                        ins = (
                            "INSERT INTO iceberg_tables (catalog_name, table_namespace, "
                            "table_name, metadata_location) VALUES (?,?,?,?)"
                        )
                    con.execute(
                        ins,
                        (self.catalog.name, _ns_str(self.namespace), self.name, new_loc),
                    )
                except self.catalog._driver.integrity_errors as err:
                    raise CommitFailedError(f"table {self.location} already exists") from err
            else:
                cur = con.execute(
                    "UPDATE iceberg_tables SET metadata_location=?, "
                    "previous_metadata_location=? WHERE catalog_name=? AND "
                    "table_namespace=? AND table_name=? AND metadata_location=?",
                    (
                        new_loc,
                        base_pointer,
                        self.catalog.name,
                        _ns_str(self.namespace),
                        self.name,
                        base_pointer,
                    ),
                )
                if self.catalog._driver.changes(cur) != 1:
                    raise CommitFailedError(
                        f"concurrent update to {self.location}: pointer moved"
                    )
        return new_loc


class JdbcCatalog:
    def __init__(
        self,
        db_path: str,
        warehouse: str,
        name: str = "jdbc",
        io_impl: str = "pyarrow",
        lock_impl: str | None = None,
        schema_version: str = "V1",
        driver="sqlite",
    ):
        self.db_path = db_path
        self.name = name
        self._driver = resolve_db_driver(driver)
        # connection pool (reference JdbcClientPool parity): poolable
        # drivers (sqlite, duckdb) lease connections per transaction
        # and return them; a non-poolable injected driver connects per
        # transaction and the `with` scope closes the connection
        self._pool: list = []
        self._pool_lock = threading.Lock()
        self._closed = False
        self.io = RelativeFileIO(warehouse, io_impl=io_impl, lock_impl=lock_impl)
        self.warehouse = self.io.warehouse
        with self._conn() as con:
            con.execute(_CATALOG_TABLE_DDL)  # reference initializeCatalogTables :119-155
            con.execute(_NAMESPACE_TABLE_DDL)
        # reference updateSchemaIfRequired (:157-188): a pre-existing V0
        # catalog (no record_type column) upgrades in place when V1 is
        # requested, else stays V0 with views unavailable. Fresh DBs are
        # created V1 by the DDL above. (Deviation noted: the reference
        # defaults the property to V0; here V1 is the default because the
        # SQL front-end exposes views out of the box.)
        self.schema_version = self._update_schema_if_required(schema_version)

    def _update_schema_if_required(self, requested: str) -> str:
        with self._conn() as con:
            cols = [
                r[1]
                for r in con.execute("PRAGMA table_info(iceberg_tables)").fetchall()
            ]
            if "record_type" in cols:
                return "V1"
            if requested.upper() == "V1":
                con.execute(self._driver.migrate_v1_sql)
                return "V1"
            return "V0"

    @property
    def _t(self) -> str:
        """Version-aware TABLE-row predicate: V0 has no record_type."""
        return " AND record_type='TABLE'" if self.schema_version == "V1" else ""

    def _require_views(self) -> None:
        if self.schema_version != "V1":
            raise NotImplementedError(
                "view operations require schema V1; reopen the catalog with "
                "schema_version='V1' to upgrade in place (reference "
                "JdbcRelativeCatalog view warning)"
            )

    _POOL_MAX = 4  # idle connections kept; concurrent txns may exceed it

    def _conn(self):
        if getattr(self._driver, "poolable", False):
            return _PooledTxn(self)
        if self._closed:
            raise ValueError(f"catalog {self.name!r} is closed")
        return self._driver.connect(self.db_path)

    def close(self) -> None:
        """Shut the catalog's connection pool (reference ``close()``,
        JdbcRelativeCatalog.java:460-464). Idempotent; later catalog
        calls raise. The IO handle is stateless and needs no teardown."""
        with self._pool_lock:
            self._closed = True
            pool, self._pool = self._pool, []
        for con in pool:
            con.close()

    def __enter__(self) -> "JdbcCatalog":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.close()
        return False

    def _fetchone(self, sql, params=()):
        with self._conn() as con:
            return con.execute(sql, params).fetchone()

    def _fetchall(self, sql, params=()):
        with self._conn() as con:
            return con.execute(sql, params).fetchall()

    # -- locations (A34) ------------------------------------------------------
    def default_warehouse_location(self, namespace, name: str) -> str:
        return f"{_ns_str(namespace)}/{name}" if namespace else name

    # -- namespaces (A38) -------------------------------------------------------
    def create_namespace(self, namespace, properties: dict | None = None) -> None:
        ns = _ns_str(namespace)
        if self.namespace_exists(namespace):
            raise ValueError(f"namespace {ns} already exists")
        props = dict(properties or {})
        props[_NAMESPACE_EXISTS_PROP] = "true"
        with self._conn() as con:
            con.executemany(
                "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?,?,?,?)",
                [(self.name, ns, k, v) for k, v in props.items()],
            )

    def namespace_exists(self, namespace) -> bool:
        ns = _ns_str(namespace)
        if self._fetchone(
            "SELECT 1 FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
            (self.name, ns),
        ):
            return True
        # implicit namespaces: any PREFIX of an existing table's
        # namespace, or of an explicitly created deeper namespace
        # (create_namespace(('a','b')) makes ('a',) listable, so
        # exists() must agree with list_namespaces()). LIKE wildcards
        # in the name itself are escaped — an underscore namespace
        # ('a_c') must not match unrelated rows ('abc/...').
        esc = ns.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        return bool(
            self._fetchone(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND "
                "(table_namespace=? OR table_namespace LIKE ? ESCAPE '\\')",
                (self.name, ns, esc + "/%"),
            )
        ) or bool(
            self._fetchone(
                "SELECT 1 FROM iceberg_namespace_properties WHERE "
                "catalog_name=? AND namespace LIKE ? ESCAPE '\\'",
                (self.name, esc + "/%"),
            )
        )

    def list_namespaces(self, namespace=()) -> list[tuple[str, ...]]:
        prefix = _ns_str(namespace)
        like = (prefix + "/%") if prefix else "%"
        rows = self._fetchall(
            "SELECT DISTINCT namespace FROM iceberg_namespace_properties "
            "WHERE catalog_name=? AND namespace LIKE ? "
            "UNION SELECT DISTINCT table_namespace FROM iceberg_tables "
            "WHERE catalog_name=? AND table_namespace LIKE ?",
            (self.name, like, self.name, like),
        )
        depth = len(tuple(namespace)) + 1
        out = set()
        for (ns,) in rows:
            parts = tuple(ns.split("/"))
            if len(parts) >= depth and parts[: depth - 1] == tuple(namespace):
                out.add(parts[:depth])  # fuzzy-match exclusion (reference :341-363)
        return sorted(out)

    def drop_namespace(self, namespace) -> None:
        ns = _ns_str(namespace)
        views = self.list_views(namespace) if self.schema_version == "V1" else []
        if self.list_tables(namespace) or views or self.list_namespaces(namespace):
            raise ValueError(f"namespace {ns} is not empty")  # reference :394-397
        with self._conn() as con:
            con.execute(
                "DELETE FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
                (self.name, ns),
            )

    def load_namespace_metadata(self, namespace) -> dict:
        ns = _ns_str(namespace)
        if not self.namespace_exists(namespace):
            raise NoSuchTableError(f"no such namespace {ns}")
        rows = self._fetchall(
            "SELECT property_key, property_value FROM iceberg_namespace_properties "
            "WHERE catalog_name=? AND namespace=?",
            (self.name, ns),
        )
        return {k: v for k, v in rows if k != _NAMESPACE_EXISTS_PROP}

    def set_namespace_properties(self, namespace, properties: dict) -> None:
        ns = _ns_str(namespace)
        with self._conn() as con:
            con.executemany(
                "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?,?,?,?)",
                [(self.name, ns, k, v) for k, v in properties.items()],
            )

    def remove_namespace_properties(self, namespace, keys) -> None:
        ns = _ns_str(namespace)
        with self._conn() as con:
            con.executemany(
                "DELETE FROM iceberg_namespace_properties WHERE catalog_name=? "
                "AND namespace=? AND property_key=?",
                [(self.name, ns, k) for k in keys if k != _NAMESPACE_EXISTS_PROP],
            )

    # -- tables (A35-A37) -----------------------------------------------------------
    def new_table_ops(self, namespace, name: str) -> JdbcTableOperations:
        return JdbcTableOperations(self, namespace, name)

    def create_table(
        self,
        namespace,
        name: str,
        schema_json: dict,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
        sort_order: list[str] | None = None,
    ) -> JdbcTableOperations:
        if self.schema_version == "V1" and self._view_pointer(namespace, name):
            # view-aware replace guard (reference :674-691); V0 has no views
            raise ValueError(f"a view named {name} already exists")
        ops = self.new_table_ops(namespace, name)
        meta = new_table_metadata(
            ops.location, schema_json, partition_by, properties, sort_order
        )
        meta["snapshots"] = []
        ops.commit(None, meta)
        return ops

    def load_table(self, namespace, name: str) -> JdbcTableOperations:
        ops = self.new_table_ops(namespace, name)
        ops.current()
        return ops

    def table_exists(self, namespace, name: str) -> bool:
        return (
            self._fetchone(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=?" + self._t,
                (self.name, _ns_str(namespace), name),
            )
            is not None
        )

    def list_tables(self, namespace) -> list[str]:
        return [
            r[0]
            for r in self._fetchall(
                "SELECT table_name FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=?" + self._t + " ORDER BY table_name",
                (self.name, _ns_str(namespace)),
            )
        ]

    def drop_table(self, namespace, name: str, purge: bool = False) -> bool:
        ops = self.new_table_ops(namespace, name)
        ptr = ops._pointer()
        if ptr is None:
            return False
        with self._conn() as con:
            con.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? "
                "AND table_name=?" + self._t,
                (self.name, _ns_str(namespace), name),
            )
        if purge:
            try:
                self.io.delete_prefix(ops.location)
            except Exception:
                pass
        return True

    def rename_table(self, src_namespace, src_name: str, dst_namespace, dst_name: str) -> None:
        """A37: supported here, unlike the FS catalog. Data files don't
        move; only the catalog row changes — cheap at any scale because
        stored locations are relative to the (unchanged) warehouse."""
        if self._fetchone(
            "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
            (self.name, _ns_str(dst_namespace), dst_name),
        ):
            raise ValueError(f"destination {dst_name} already exists")
        with self._conn() as con:
            cur = con.execute(
                "UPDATE iceberg_tables SET table_namespace=?, table_name=? "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?"
                + self._t,
                (
                    _ns_str(dst_namespace),
                    dst_name,
                    self.name,
                    _ns_str(src_namespace),
                    src_name,
                ),
            )
            if self._driver.changes(cur) != 1:
                raise NoSuchTableError(f"no such table {src_name}")

    # -- views (A39; V1-only, reference newViewOps guard) -------------------------
    def _view_pointer(self, namespace, name: str) -> str | None:
        self._require_views()
        row = self._fetchone(
            "SELECT metadata_location FROM iceberg_tables WHERE catalog_name=? AND "
            "table_namespace=? AND table_name=? AND record_type='VIEW'",
            (self.name, _ns_str(namespace), name),
        )
        return row[0] if row else None

    def create_view(self, namespace, name: str, sql: str, replace: bool = False) -> None:
        self._require_views()
        if self._fetchone(
            "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? "
            "AND table_name=? AND record_type='TABLE'",
            (self.name, _ns_str(namespace), name),
        ):
            raise ValueError(f"a table named {name} already exists")
        doc = {
            "view-uuid": str(uuid.uuid4()),
            "sql": sql,
            "created-ms": int(time.time() * 1000),
        }
        loc = f"{self.default_warehouse_location(namespace, name)}/metadata/{uuid.uuid4()}.view.json"
        self.io.write_bytes(loc, json.dumps(doc).encode())
        with self._conn() as con:
            if replace:
                con.execute(
                    "INSERT OR REPLACE INTO iceberg_tables (catalog_name, table_namespace, "
                    "table_name, metadata_location, record_type) VALUES (?,?,?,?,'VIEW')",
                    (self.name, _ns_str(namespace), name, loc),
                )
            else:
                try:
                    con.execute(
                        "INSERT INTO iceberg_tables (catalog_name, table_namespace, "
                        "table_name, metadata_location, record_type) VALUES (?,?,?,?,'VIEW')",
                        (self.name, _ns_str(namespace), name, loc),
                    )
                except self._driver.integrity_errors as err:
                    raise ValueError(f"view {name} already exists") from err

    def load_view_sql(self, namespace, name: str) -> str:
        ptr = self._view_pointer(namespace, name)
        if ptr is None:
            raise NoSuchTableError(f"no such view {name}")
        return json.loads(self.io.read_bytes(ptr))["sql"]

    def list_views(self, namespace) -> list[str]:
        self._require_views()
        return [
            r[0]
            for r in self._fetchall(
                "SELECT table_name FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND record_type='VIEW' ORDER BY table_name",
                (self.name, _ns_str(namespace)),
            )
        ]

    def drop_view(self, namespace, name: str) -> bool:
        self._require_views()
        with self._conn() as con:
            cur = con.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? "
                "AND table_name=? AND record_type='VIEW'",
                (self.name, _ns_str(namespace), name),
            )
            return self._driver.changes(cur) > 0

    def rename_view(self, src_namespace, src_name: str, dst_namespace, dst_name: str) -> None:
        self._require_views()
        # destination-exists guard (same contract as rename_table):
        # without it the UPDATE violates the primary key and a raw
        # driver-specific IntegrityError escapes to the caller
        if self._fetchone(
            "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND "
            "table_namespace=? AND table_name=?",
            (self.name, _ns_str(dst_namespace), dst_name),
        ):
            raise ValueError(
                f"cannot rename view: {dst_name!r} already exists in "
                f"{_ns_str(dst_namespace)!r}"
            )
        with self._conn() as con:
            cur = con.execute(
                "UPDATE iceberg_tables SET table_namespace=?, table_name=? "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=? "
                "AND record_type='VIEW'",
                (
                    _ns_str(dst_namespace),
                    dst_name,
                    self.name,
                    _ns_str(src_namespace),
                    src_name,
                ),
            )
            if self._driver.changes(cur) != 1:
                raise NoSuchTableError(f"no such view {src_name}")
