"""SQL front-end over the relative-path catalog.

The reference is *driven entirely through SQL*: its README configures the
catalog plugin and then runs ``CREATE TABLE`` / ``INSERT INTO`` /
``SELECT *`` as plain Spark SQL statements (reference README.md:8-18).
``RelativeSqlSession`` gives our catalog the same statement surface: DDL
and DML against catalog-qualified names are dispatched to the catalog /
table layer, and SELECTs are executed by Spark SQL itself after each
``<catalog>.<ns…>.<table>`` reference is resolved through the catalog and
registered as a temp view — so analysis, optimization, and execution stay
entirely inside Catalyst; this module only does name resolution, exactly
the division of labor the reference has with its SparkCatalog plugin.

Supported statement surface (the README dialect plus the table features
the format provides):

- ``CREATE NAMESPACE [IF NOT EXISTS] cat.ns``
- ``CREATE TABLE [IF NOT EXISTS] cat.ns.t (col type, …)
  [PARTITIONED BY (col, …)]`` and ``CREATE TABLE … AS SELECT …``
- ``INSERT INTO cat.ns.t VALUES (…), (…)`` / ``INSERT INTO … SELECT …``
- ``SELECT …`` with any number of catalog-qualified references, each
  optionally suffixed ``VERSION AS OF n`` / ``TIMESTAMP AS OF 'iso'``
  (B28 time travel) or the metadata tables ``cat.ns.t.snapshots`` /
  ``cat.ns.t.history`` / ``cat.ns.t.files`` (B29)
- ``DROP TABLE [IF EXISTS] cat.ns.t [PURGE]``, ``DROP NAMESPACE cat.ns``
- ``SHOW TABLES IN cat.ns``
- row-level DML, copy-on-write like Iceberg's Spark extensions:
  ``DELETE FROM cat.ns.t WHERE …``, ``UPDATE cat.ns.t SET c = e [WHERE …]``,
  upsert-form ``MERGE INTO … USING … ON … WHEN MATCHED THEN UPDATE SET *
  WHEN NOT MATCHED THEN INSERT *``, ``ALTER TABLE cat.ns.t
  ADD COLUMN / RENAME COLUMN / DROP COLUMN``
- maintenance procedures, Iceberg's ``CALL`` surface:
  ``CALL cat.system.expire_snapshots('ns.t', keep_last)`` /
  ``remove_orphan_files('ns.t')`` / ``rewrite_data_files('ns.t', n)`` /
  ``rewrite_zorder('ns.t', 'c1,c2')`` / ``rollback_to_snapshot('ns.t', id)`` /
  ``fast_forward('ns.t', 'branch')`` /
  ``create_changelog_view('ns.t', from_sid[, to_sid[, view]])`` /
  ``release_session_caches()`` (session-scoped, no table: the
  long-session cache-lifecycle hook, reachable from pure SQL)

Known limitation (documented, not defended): qualified names are located
lexically, so a string literal containing ``cat.ns.t`` would be rewritten
too — the same class of caveat the README's SQL examples never hit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from iceberg_relative_io_spark.catalog.fs_catalog import FsCatalog
from iceberg_relative_io_spark.catalog.spark_table import RelativeTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


class SqlParseError(ValueError):
    pass


class RelativeSqlSession:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        catalog_name: str = "test",
        catalog=None,
    ):
        """``catalog`` defaults to a path-based FsCatalog; pass a
        JdbcCatalog to add view DDL (views live only in the JDBC catalog,
        like the reference — JdbcRelativeCatalog.java:51-52 vs the
        view-less Hadoop catalog)."""
        self.spark = spark
        self.catalog = catalog if catalog is not None else FsCatalog(warehouse, name=catalog_name)
        self.name = catalog_name
        self._view_n = 0

    # -- helpers ---------------------------------------------------------------
    def _table(self, namespace: tuple[str, ...], name: str) -> RelativeTable:
        return RelativeTable(self.catalog.load_table(namespace, name))

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "result string")

    def _split_ident(self, dotted: str) -> tuple[tuple[str, ...], str]:
        parts = dotted.split(".")
        if parts[0] != self.name or len(parts) < 3:
            raise SqlParseError(
                f"identifier {dotted!r} is not a {self.name}-catalog table"
            )
        return tuple(parts[1:-1]), parts[-1]

    # -- SELECT rewriting ------------------------------------------------------
    def _resolve_refs(self, sql: str) -> str:
        """Register every catalog-qualified reference as a temp view and
        rewrite the SQL to use the view names."""
        pattern = re.compile(
            rf"\b{re.escape(self.name)}(?:\.{_IDENT}){{2,}}"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(?:(\d+)|'([^']+)')|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?",
            re.IGNORECASE,
        )

        def sub(m: re.Match) -> str:
            dotted = m.group(0).split()[0]
            version = m.group(1)
            ref = m.group(2)  # VERSION AS OF 'branch-or-tag'
            ts = m.group(3)
            parts = dotted.split(".")
            meta_view = None
            if parts[-1].lower() in (
                "snapshots", "history", "files", "refs", "partitions",
                "manifests",
            ) and len(parts) >= 4:
                meta_view, parts = parts[-1].lower(), parts[:-1]
            namespace, tname = tuple(parts[1:-1]), parts[-1]
            if meta_view is None and version is None and ref is None and ts is None:
                vsql = self._stored_view_sql(namespace, tname)
                if vsql is not None:
                    # a view: expand its stored SQL (which may itself
                    # reference catalog tables or other views)
                    df = self.spark.sql(self._resolve_refs(vsql))
                    self._view_n += 1
                    view = f"__rel_view_{tname}_{self._view_n}"
                    df.createOrReplaceTempView(view)
                    return view
            table = self._table(namespace, tname)
            if meta_view == "snapshots":
                df = table.snapshots(self.spark)
            elif meta_view == "history":
                df = table.history(self.spark)
            elif meta_view == "files":
                df = table.files(self.spark)
            elif meta_view == "refs":
                df = table.refs(self.spark)
            elif meta_view == "partitions":
                df = table.partitions(self.spark)
            elif meta_view == "manifests":
                df = table.manifests(self.spark)
            elif version is not None:
                df = table.read(self.spark, snapshot_id=int(version))
            elif ref is not None:
                # a quoted version is a named ref: tag first, then branch
                # (Iceberg's VERSION AS OF 'name' resolution order)
                if ref in table.tags():
                    df = table.read(self.spark, tag=ref)
                else:
                    df = table.read(self.spark, branch=ref)
            elif ts is not None:
                import datetime

                ms = int(
                    datetime.datetime.fromisoformat(ts).timestamp() * 1000
                )
                df = table.read(self.spark, as_of_timestamp_ms=ms)
            else:
                df = table.read(self.spark)
            self._view_n += 1
            view = f"__rel_{self.name}_{'_'.join(namespace)}_{tname}_{self._view_n}"
            df.createOrReplaceTempView(view)
            return view

        return pattern.sub(sub, sql)

    # -- statement dispatch ----------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        stmt = statement.strip().rstrip(";").strip()
        head = stmt.split(None, 2)
        keyword = " ".join(head[:2]).upper() if len(head) >= 2 else stmt.upper()

        if keyword.startswith("CREATE NAMESPACE"):
            return self._create_namespace(stmt)
        if re.match(r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\b", stmt, re.IGNORECASE):
            return self._create_view(stmt)
        if keyword.startswith("DROP VIEW"):
            return self._drop_view(stmt)
        if keyword.startswith("CREATE TABLE"):
            return self._create_table(stmt)
        if keyword.startswith("INSERT INTO") or keyword.startswith("INSERT OVERWRITE"):
            return self._insert(stmt)
        if keyword.startswith("DESCRIBE TABLE") or keyword.startswith("DESCRIBE "):
            return self._describe(stmt)
        if keyword.startswith("TRUNCATE TABLE"):
            return self._truncate(stmt)
        if keyword.startswith("DELETE FROM"):
            return self._delete(stmt)
        if keyword.startswith("UPDATE"):
            return self._update(stmt)
        if keyword.startswith("MERGE INTO"):
            return self._merge(stmt)
        if keyword.startswith("ALTER TABLE"):
            return self._alter_table(stmt)
        if keyword.startswith("DROP TABLE"):
            return self._drop_table(stmt)
        if keyword.startswith("DROP NAMESPACE"):
            return self._drop_namespace(stmt)
        if keyword.startswith("SHOW TABLES"):
            return self._show_tables(stmt)
        if keyword.startswith("SHOW TBLPROPERTIES"):
            m = re.fullmatch(
                r"SHOW\s+TBLPROPERTIES\s+([\w.]+)", stmt, re.IGNORECASE
            )
            if not m:
                raise SqlParseError(f"cannot parse: {stmt!r}")
            namespace, name = self._split_ident(m.group(1))
            props = self._table(namespace, name).properties()
            return self.spark.createDataFrame(
                sorted(props.items()) or [], "key string, value string"
            )
        if keyword.startswith("CALL "):
            return self._call(stmt)
        # everything else (SELECT / WITH …) runs in Spark SQL after
        # catalog references are resolved to views
        return self.spark.sql(self._resolve_refs(stmt))

    # -- views (JDBC catalog only, like the reference: A39) --------------------
    def _stored_view_sql(self, namespace, name: str) -> str | None:
        if not hasattr(self.catalog, "load_view_sql"):
            return None
        try:
            return self.catalog.load_view_sql(namespace, name)
        except Exception:
            return None

    def _create_view(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        if not hasattr(self.catalog, "create_view"):
            raise ValueError(
                "views require the JDBC catalog (pass catalog=JdbcCatalog(...)); "
                "the path-based catalog has no views, like the reference"
            )
        namespace, name = self._split_ident(m.group(2))
        body = m.group(3)
        self.spark.sql(self._resolve_refs(body))  # validate references now
        self.catalog.create_view(namespace, name, body, replace=bool(m.group(1)))
        return self._empty()

    def _drop_view(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)", stmt, re.IGNORECASE
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(2))
        dropped = hasattr(self.catalog, "drop_view") and self.catalog.drop_view(
            namespace, name
        )
        if not dropped and not m.group(1):
            raise ValueError(f"no such view {m.group(2)}")
        return self._empty()

    # -- DDL -------------------------------------------------------------------
    def _create_namespace(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"CREATE\s+NAMESPACE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        parts = m.group(2).split(".")
        if parts[0] != self.name:
            raise SqlParseError(f"unknown catalog {parts[0]!r}")
        namespace = tuple(parts[1:])
        try:
            self.catalog.create_namespace(namespace)
        except Exception:
            if not m.group(1):
                raise
        return self._empty()

    def _create_table(self, stmt: str) -> DataFrame:
        ctas = re.fullmatch(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+(SELECT\b.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if ctas:
            namespace, name = self._split_ident(ctas.group(2))
            if ctas.group(1) and self.catalog.table_exists(namespace, name):
                return self._empty()
            df = self.spark.sql(self._resolve_refs(ctas.group(3)))
            ops = self.catalog.create_table(namespace, name, df.schema.jsonValue())
            RelativeTable(ops).append(df)
            return self._empty()

        m = re.fullmatch(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
            r"\((.*?)\)\s*(?:PARTITIONED\s+BY\s*\((.*)\))?",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(2))
        if m.group(1) and self.catalog.table_exists(namespace, name):
            return self._empty()
        schema = StructType.fromDDL(m.group(3))
        # split on top-level commas only: transform entries like
        # bucket(8, id) carry their own comma
        partition_by = (
            [c.strip() for c in re.split(r",(?![^(]*\))", m.group(4))]
            if m.group(4)
            else None
        )
        self.catalog.create_table(
            namespace, name, schema.jsonValue(), partition_by=partition_by
        )
        return self._empty()

    def _drop_table(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)(\s+PURGE)?",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(2))
        dropped = self.catalog.drop_table(namespace, name, purge=bool(m.group(3)))
        if not dropped and not m.group(1):
            raise ValueError(f"no such table {m.group(2)}")
        return self._empty()

    def _drop_namespace(self, stmt: str) -> DataFrame:
        m = re.fullmatch(r"DROP\s+NAMESPACE\s+([\w.]+)", stmt, re.IGNORECASE)
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        parts = m.group(1).split(".")
        if parts[0] != self.name:
            raise SqlParseError(f"unknown catalog {parts[0]!r}")
        self.catalog.drop_namespace(tuple(parts[1:]))
        return self._empty()

    def _show_tables(self, stmt: str) -> DataFrame:
        m = re.fullmatch(r"SHOW\s+TABLES\s+IN\s+([\w.]+)", stmt, re.IGNORECASE)
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        parts = m.group(1).split(".")
        if parts[0] != self.name:
            raise SqlParseError(f"unknown catalog {parts[0]!r}")
        names = self.catalog.list_tables(tuple(parts[1:]))
        return self.spark.createDataFrame(
            [(n,) for n in names], "tableName string"
        )

    # -- maintenance procedures (Iceberg's CALL cat.system.* surface) ----------
    def _call(self, stmt: str) -> DataFrame:
        # session-scoped (no-table) procedures first:
        # CALL cat.system.release_session_caches() unpersists + clears
        # every registered session cache (the long-session hygiene
        # contract) so a long-lived pure-SQL session can honor it
        # without Python imports — warehouse parity with bench.py and
        # scaling_study.py calling caches.release_session_caches.
        m0 = re.fullmatch(
            rf"CALL\s+{re.escape(self.name)}\.system\.(\w+)\s*\(\s*\)",
            stmt,
            re.IGNORECASE,
        )
        if m0:
            proc = m0.group(1).lower()
            if proc == "release_session_caches":
                from iceberg_relative_io_spark import caches

                released = caches.release_session_caches(self.spark)
                return self.spark.createDataFrame(
                    [(str(released),)], "result string"
                )
            raise SqlParseError(f"unknown procedure {proc!r}")
        m = re.fullmatch(
            rf"CALL\s+{re.escape(self.name)}\.system\.(\w+)\s*\(\s*'([\w.]+)'\s*"
            r"(?:,\s*([\w'\.\, ]+?)\s*)?\)",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        proc, dotted, arg = m.group(1).lower(), m.group(2), m.group(3)
        parts = dotted.split(".")
        table = self._table(tuple(parts[:-1]), parts[-1])
        if proc == "expire_snapshots":
            result = table.expire_snapshots(keep_last=int(arg) if arg else 1)
            rows = [(str(result),)]
        elif proc == "remove_orphan_files":
            rows = [(p,) for p in table.remove_orphan_files()] or [("0 orphans",)]
        elif proc == "rewrite_data_files":
            result = table.compact(self.spark, int(arg) if arg else 1)
            rows = [(str(result["snapshot-id"]),)]
        elif proc == "rewrite_zorder":
            cols = [c.strip() for c in arg.strip().strip("'").split(",") if c.strip()]
            result = table.rewrite_zorder(self.spark, cols)
            rows = [(str(result["snapshot-id"]),)]
        elif proc == "rewrite_manifests":
            result = table.rewrite_manifests()
            rows = [(str(result["snapshot-id"]),)]
        elif proc == "rollback_to_snapshot":
            table.rollback_to_snapshot(int(arg))
            rows = [("ok",)]
        elif proc == "create_tag":
            table.create_tag(arg.strip().strip("'"))
            rows = [("ok",)]
        elif proc == "create_branch":
            table.create_branch(arg.strip().strip("'"))
            rows = [("ok",)]
        elif proc == "fast_forward":
            table.fast_forward(arg.strip().strip("'"))
            rows = [("ok",)]
        elif proc == "cherrypick_snapshot":
            result = table.cherry_pick_snapshot(int(arg))
            rows = [(str(result["snapshot-id"]),)]
        elif proc == "create_changelog_view":
            # Iceberg's CDC procedure shape: register the net row diff
            # between two snapshots as a temp view, return its name.
            # CALL cat.system.create_changelog_view('ns.t', from_sid
            # [, to_sid [, view_name]])
            args = [a.strip().strip("'") for a in (arg or "").split(",")]
            if not args or not args[0]:
                raise SqlParseError(
                    "create_changelog_view needs a from-snapshot id"
                )
            from_sid = int(args[0])
            to_sid = int(args[1]) if len(args) > 1 and args[1] else None
            view = (
                args[2]
                if len(args) > 2 and args[2]
                else f"{parts[-1]}_changes"
            )
            table.changelog(self.spark, from_sid, to_sid).createOrReplaceTempView(
                view
            )
            rows = [(view,)]
        else:
            raise SqlParseError(f"unknown procedure {proc!r}")
        return self.spark.createDataFrame(rows, "result string")

    # -- row-level DML (copy-on-write, like Iceberg's Spark extensions) --------
    def _delete(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(1))
        table = self._table(namespace, name)
        cond = F.expr(m.group(2))
        if table.properties().get("write.delete.mode") == "merge-on-read":
            # equality delete over ALL columns removes exactly the rows
            # satisfying the predicate, costing O(deleted keys) instead of
            # a full copy-on-write table rewrite
            cols = [f.name for f in table.schema().fields]
            table.delete_where_mor(self.spark, cond, equality_cols=cols)
        else:
            table.delete_where(self.spark, cond)
        return self._empty()

    def _update(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(1))
        assignments = {}
        for part in self._split_top_level(m.group(2)):
            col, _, expr = part.partition("=")
            assignments[col.strip()] = F.expr(expr.strip())
        cond = F.expr(m.group(3)) if m.group(3) else F.lit(True)
        table = self._table(namespace, name)
        if table.properties().get("write.update.mode") == "merge-on-read":
            cols = [f.name for f in table.schema().fields]
            table.update_where_mor(self.spark, cond, assignments, equality_cols=cols)
        else:
            table.update_where(self.spark, cond, assignments)
        return self._empty()

    @staticmethod
    def _split_top_level(s: str) -> list[str]:
        """Split on commas not nested inside parentheses or quotes."""
        parts, depth, start, quote = [], 0, 0, None
        for i, ch in enumerate(s):
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(s[start:i])
                start = i + 1
        parts.append(s[start:])
        return [p for p in (p.strip() for p in parts) if p]

    def _merge(self, stmt: str) -> DataFrame:
        """Upsert-form MERGE (the shape Iceberg's COW tables compile to):
        WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *,
        with an equi-key ON clause."""
        m = re.fullmatch(
            r"MERGE\s+INTO\s+([\w.]+)(?:\s+AS)?(?:\s+(\w+))?\s+"
            r"USING\s+(\((?:.*)\)|[\w.]+)(?:\s+AS)?(?:\s+(\w+))?\s+"
            r"ON\s+(.*?)\s+"
            r"WHEN\s+MATCHED\s+THEN\s+(UPDATE\s+SET\s+\*|DELETE)\s+"
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(
                f"cannot parse (only 'UPDATE SET */DELETE + INSERT *' MERGE is supported): {stmt!r}"
            )
        namespace, name = self._split_ident(m.group(1))
        source_sql = m.group(3)
        if source_sql.startswith("("):
            source = self.spark.sql(self._resolve_refs(source_sql[1:-1]))
        else:
            s_ns, s_name = self._split_ident(source_sql)
            source = self._table(s_ns, s_name).read(self.spark)
        key_cols = []
        for clause in re.split(r"\s+AND\s+", m.group(5), flags=re.IGNORECASE):
            lhs, _, rhs = clause.partition("=")
            lcol = lhs.strip().split(".")[-1]
            rcol = rhs.strip().split(".")[-1]
            if lcol != rcol:
                raise SqlParseError(
                    f"MERGE ON clause must equate same-named key columns: {clause!r}"
                )
            key_cols.append(lcol)
        action = "delete" if m.group(6).upper() == "DELETE" else "update"
        self._table(namespace, name).merge(self.spark, source, key_cols, matched=action)
        return self._empty()

    def _alter_table(self, stmt: str) -> DataFrame:
        add = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMNS?\s*\(?\s*(\w+)\s+([\w()<>, ]+?)\s*\)?",
            stmt,
            re.IGNORECASE,
        )
        if add:
            namespace, name = self._split_ident(add.group(1))
            self._table(namespace, name).add_column(add.group(2), add.group(3))
            return self._empty()
        ren = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)",
            stmt,
            re.IGNORECASE,
        )
        if ren:
            namespace, name = self._split_ident(ren.group(1))
            self._table(namespace, name).rename_column(ren.group(2), ren.group(3))
            return self._empty()
        drop = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)",
            stmt,
            re.IGNORECASE,
        )
        if drop:
            namespace, name = self._split_ident(drop.group(1))
            self._table(namespace, name).drop_column(drop.group(2))
            return self._empty()
        # type promotion: ALTER TABLE t ALTER COLUMN c TYPE bigint
        widen = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w(),]+)",
            stmt,
            re.IGNORECASE,
        )
        if widen:
            namespace, name = self._split_ident(widen.group(1))
            ddl_to_json = {"bigint": "long", "int": "integer", "double": "double",
                           "float": "float", "long": "long"}
            t = widen.group(3).lower()
            self._table(namespace, name).widen_column(
                widen.group(2), ddl_to_json.get(t, t)
            )
            return self._empty()
        # write-clustering DDL: ALTER TABLE t WRITE ORDERED BY (c1, c2)
        wob = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+WRITE\s+ORDERED\s+BY\s*\(([^)]*)\)",
            stmt,
            re.IGNORECASE,
        )
        if wob:
            namespace, name = self._split_ident(wob.group(1))
            cols = [c.strip() for c in wob.group(2).split(",") if c.strip()]
            self._table(namespace, name).update_sort_order(cols)
            return self._empty()
        # table properties DDL
        setp = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.*)\)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if setp:
            namespace, name = self._split_ident(setp.group(1))
            props = dict(
                re.findall(r"'([^']+)'\s*=\s*'([^']*)'", setp.group(2))
            )
            if not props:
                raise SqlParseError(f"no properties in: {stmt!r}")
            self._table(namespace, name).set_properties(props)
            return self._empty()
        unsetp = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+UNSET\s+TBLPROPERTIES\s*\((.*)\)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if unsetp:
            namespace, name = self._split_ident(unsetp.group(1))
            keys = re.findall(r"'([^']+)'", unsetp.group(2))
            self._table(namespace, name).unset_properties(keys)
            return self._empty()
        # Iceberg partition-evolution DDL: ADD/DROP PARTITION FIELD
        pf = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+"
            r"(\w+(?:\([\w, ]*\))?)",
            stmt,
            re.IGNORECASE,
        )
        if pf:
            namespace, name = self._split_ident(pf.group(1))
            table = self._table(namespace, name)
            spec = list(table.partition_spec)
            col = pf.group(3).strip()
            if pf.group(2).upper() == "ADD":
                if col not in spec:
                    spec.append(col)
            else:
                spec = [c for c in spec if c != col]
            table.update_partition_spec(spec)
            return self._empty()
        ren_t = re.fullmatch(
            r"ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)",
            stmt,
            re.IGNORECASE,
        )
        if ren_t:
            # JDBC catalog only; the path-based catalog raises, like the
            # reference's HadoopRelativeCatalog (:238-241)
            src_ns, src = self._split_ident(ren_t.group(1))
            dst = ren_t.group(2)
            dst_ns, dst_name = (
                self._split_ident(dst) if "." in dst else (src_ns, dst)
            )
            self.catalog.rename_table(src_ns, src, dst_ns, dst_name)
            return self._empty()
        raise SqlParseError(f"cannot parse: {stmt!r}")

    # -- DML -------------------------------------------------------------------
    def _insert(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"INSERT\s+(INTO|OVERWRITE)(?:\s+TABLE)?\s+([\w.]+)\s+"
            r"(VALUES\b.*|SELECT\b.*|WITH\b.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(2))
        table = self._table(namespace, name)
        schema = table.schema()
        body = m.group(3)
        if body[:6].upper() == "VALUES":
            cols = ", ".join(f.name for f in schema.fields)
            df = self.spark.sql(f"SELECT * FROM ({body}) AS v({cols})")
        else:
            df = self.spark.sql(self._resolve_refs(body))
            for field, col in zip(schema.fields, df.columns):
                df = df.withColumnRenamed(col, field.name)
        casted = df.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields]
        )
        if m.group(1).upper() == "OVERWRITE":
            if (
                table.partition_spec
                and table.properties().get("write.overwrite.mode") == "dynamic"
            ):
                # Spark's dynamic partitionOverwriteMode semantics: only
                # the partitions present in the new data are replaced
                table.overwrite_partitions(casted)
            else:
                table.overwrite(casted)
        else:
            table.append(casted)
        return self._empty()

    def _describe(self, stmt: str) -> DataFrame:
        m = re.fullmatch(
            r"DESCRIBE\s+(?:TABLE\s+)?([\w.]+)", stmt, re.IGNORECASE
        )
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(1))
        table = self._table(namespace, name)
        from iceberg_relative_io_spark.catalog.spark_table import parse_partition_field

        spec = {parse_partition_field(e)["source"] for e in table.partition_spec}
        rows = [
            (f.name, f.dataType.simpleString(), f.name in spec)
            for f in table.schema().fields
        ]
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, is_partition boolean"
        )

    def _truncate(self, stmt: str) -> DataFrame:
        m = re.fullmatch(r"TRUNCATE\s+TABLE\s+([\w.]+)", stmt, re.IGNORECASE)
        if not m:
            raise SqlParseError(f"cannot parse: {stmt!r}")
        namespace, name = self._split_ident(m.group(1))
        table = self._table(namespace, name)
        table.overwrite(self.spark.createDataFrame([], table.schema()))
        return self._empty()
