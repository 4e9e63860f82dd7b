"""README-replay e2e through the SQL front-end (SURVEY.md §5.3).

The reference is exercised through plain Spark SQL (reference
README.md:14-18: CREATE TABLE / INSERT INTO / SELECT *); these tests run
that exact statement sequence against RelativeSqlSession and then assert
the reference's acceptance criterion — the emitted metadata contains no
absolute paths (README.md:21-109) — plus the headline warehouse-move
promise (README.md:112-121), time travel, CTAS, and metadata tables.
"""

import json
import tempfile

import pytest

from iceberg_relative_io_spark.catalog import RelativeSqlSession


@pytest.fixture()
def sess(spark):
    return RelativeSqlSession(spark, tempfile.mkdtemp(prefix="sqlwh_"), "test")


def _readme_flow(sess):
    sess.sql("CREATE NAMESPACE test.my_ns")
    sess.sql("CREATE TABLE test.my_ns.my_table (id bigint, data string, category string)")
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (1, 'a', 'odd'), (2, 'b', 'even')")
    return sess.sql("SELECT * FROM test.my_ns.my_table")


def test_readme_replay_create_insert_select(sess):
    rows = {(r.id, r.data, r.category) for r in _readme_flow(sess).collect()}
    assert rows == {(1, "a", "odd"), (2, "b", "even")}


def test_metadata_has_no_absolute_paths(sess):
    _readme_flow(sess)
    io = sess.catalog.io
    for fi in io.list_prefix("my_ns/my_table/metadata"):
        if fi.location.endswith(".metadata.json"):
            meta = json.loads(io.read_bytes(fi.location))
            for snap in meta["snapshots"]:
                for entry in snap.get("added-files", []):
                    assert not entry["path"].startswith("/"), entry
            assert not meta["location"].startswith("/")


def test_warehouse_move_via_sql(sess, spark):
    import shutil

    _readme_flow(sess)
    moved = tempfile.mkdtemp(prefix="sqlwh_moved_") + "/wh"
    shutil.move(sess.catalog.warehouse.rstrip("/"), moved)
    sess2 = RelativeSqlSession(spark, moved, "test")
    out = sess2.sql("SELECT id, data FROM test.my_ns.my_table ORDER BY id")
    assert [(r.id, r.data) for r in out.collect()] == [(1, "a"), (2, "b")]


def test_time_travel_and_snapshots_table(sess):
    _readme_flow(sess)
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')")
    v1 = sess.sql("SELECT * FROM test.my_ns.my_table VERSION AS OF 1")
    assert v1.count() == 2
    now = sess.sql("SELECT * FROM test.my_ns.my_table")
    assert now.count() == 3
    snaps = sess.sql("SELECT * FROM test.my_ns.my_table.snapshots")
    assert snaps.count() == 2  # two appends
    files = sess.sql("SELECT * FROM test.my_ns.my_table.files").collect()
    assert len(files) >= 2 and all(not r.file_path.startswith("/") for r in files)
    assert sum(r.row_count for r in files) == 3
    # TIMESTAMP AS OF far in the future resolves to the current snapshot
    ts = sess.sql(
        "SELECT * FROM test.my_ns.my_table TIMESTAMP AS OF '2099-01-01T00:00:00'"
    )
    assert ts.count() == 3


def test_insert_select_and_ctas(sess):
    _readme_flow(sess)
    sess.sql(
        "CREATE TABLE test.my_ns.odds AS "
        "SELECT id, data FROM test.my_ns.my_table WHERE category = 'odd'"
    )
    sess.sql("CREATE TABLE test.my_ns.sink (id bigint, data string)")
    sess.sql("INSERT INTO test.my_ns.sink SELECT id, data FROM test.my_ns.odds")
    out = sess.sql("SELECT * FROM test.my_ns.sink")
    assert [(r.id, r.data) for r in out.collect()] == [(1, "a")]


def test_join_two_catalog_tables(sess):
    _readme_flow(sess)
    sess.sql("CREATE TABLE test.my_ns.dim (category string, label string)")
    sess.sql("INSERT INTO test.my_ns.dim VALUES ('odd', 'ODD!'), ('even', 'EVEN!')")
    out = sess.sql(
        "SELECT t.id, d.label FROM test.my_ns.my_table t "
        "JOIN test.my_ns.dim d ON t.category = d.category ORDER BY t.id"
    )
    assert [(r.id, r.label) for r in out.collect()] == [(1, "ODD!"), (2, "EVEN!")]


def test_partitioned_create_and_show_tables(sess):
    sess.sql("CREATE NAMESPACE test.p")
    sess.sql(
        "CREATE TABLE test.p.ev (id bigint, kind string) PARTITIONED BY (kind)"
    )
    sess.sql("INSERT INTO test.p.ev VALUES (1, 'click'), (2, 'view'), (3, 'click')")
    out = sess.sql("SELECT id FROM test.p.ev WHERE kind = 'click'")
    assert {r.id for r in out.collect()} == {1, 3}
    tables = {r.tableName for r in sess.sql("SHOW TABLES IN test.p").collect()}
    assert tables == {"ev"}
    # partition columns must be recorded in the manifest for pruning
    table = sess._table(("p",), "ev")
    files = table.scan_files(partition_filter={"kind": "click"})
    assert files and all(f["partition"]["kind"] == "click" for f in files)


def test_delete_update_merge_alter(sess):
    _readme_flow(sess)
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd'), (4, 'd', 'even')")

    sess.sql("DELETE FROM test.my_ns.my_table WHERE id = 4")
    assert {r.id for r in sess.sql("SELECT id FROM test.my_ns.my_table").collect()} == {1, 2, 3}

    sess.sql("UPDATE test.my_ns.my_table SET data = upper(data) WHERE category = 'odd'")
    rows = {
        (r.id, r.data)
        for r in sess.sql("SELECT id, data FROM test.my_ns.my_table").collect()
    }
    assert rows == {(1, "A"), (2, "b"), (3, "C")}

    sess.sql(
        "MERGE INTO test.my_ns.my_table t "
        "USING (SELECT 2 AS id, 'bee' AS data, 'even' AS category "
        "       UNION ALL SELECT 9, 'nine', 'odd') s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {
        (r.id, r.data)
        for r in sess.sql("SELECT id, data FROM test.my_ns.my_table").collect()
    }
    assert rows == {(1, "A"), (2, "bee"), (3, "C"), (9, "nine")}

    sess.sql("ALTER TABLE test.my_ns.my_table ADD COLUMN score double")
    out = sess.sql("SELECT id, score FROM test.my_ns.my_table WHERE id = 9")
    assert [r.score for r in out.collect()] == [None]

    sess.sql("ALTER TABLE test.my_ns.my_table RENAME COLUMN data TO payload")
    rows = {
        (r.id, r.payload)
        for r in sess.sql("SELECT id, payload FROM test.my_ns.my_table").collect()
    }
    assert rows == {(1, "A"), (2, "bee"), (3, "C"), (9, "nine")}
    sess.sql("ALTER TABLE test.my_ns.my_table DROP COLUMN score")
    cols = sess.sql("SELECT * FROM test.my_ns.my_table").columns
    assert cols == ["id", "payload", "category"]


def test_insert_overwrite_describe_truncate(sess):
    _readme_flow(sess)
    sess.sql("INSERT OVERWRITE test.my_ns.my_table VALUES (5, 'e', 'odd')")
    assert [r.id for r in sess.sql("SELECT id FROM test.my_ns.my_table").collect()] == [5]
    desc = sess.sql("DESCRIBE TABLE test.my_ns.my_table").collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("id", "bigint"), ("data", "string"), ("category", "string"),
    ]
    sess.sql("TRUNCATE TABLE test.my_ns.my_table")
    assert sess.sql("SELECT * FROM test.my_ns.my_table").count() == 0
    # snapshots preserved: the pre-truncate state is still time-travelable
    assert sess.sql("SELECT * FROM test.my_ns.my_table VERSION AS OF 2").count() == 1


def test_call_maintenance_procedures(sess):
    _readme_flow(sess)
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')")
    res = sess.sql("CALL test.system.rewrite_data_files('my_ns.my_table', 1)")
    assert res.count() == 1
    table = sess._table(("my_ns",), "my_table")
    assert len(table.scan_files()) == 1  # compacted
    sess.sql("CALL test.system.rewrite_zorder('my_ns.my_table', 'id, id')")
    sess.sql("CALL test.system.expire_snapshots('my_ns.my_table', 1)")
    sess.sql("CALL test.system.remove_orphan_files('my_ns.my_table')")
    out = sess.sql("SELECT * FROM test.my_ns.my_table")
    assert out.count() == 3  # data intact after full maintenance pass


def test_views_through_sql_with_jdbc_catalog(spark):
    """A39 via SQL: views exist only in the JDBC catalog (like the
    reference); CREATE VIEW stores the SQL text, SELECT expands it
    recursively, the FS catalog refuses view DDL."""
    import tempfile as tf

    from iceberg_relative_io_spark.catalog import JdbcCatalog

    wh = tf.mkdtemp(prefix="jdbc_sql_wh_")
    cat = JdbcCatalog(f"{wh}/catalog.db", wh, name="test")
    s = RelativeSqlSession(spark, wh, "test", catalog=cat)
    s.sql("CREATE NAMESPACE test.ns")
    s.sql("CREATE TABLE test.ns.t (id bigint, kind string)")
    s.sql("INSERT INTO test.ns.t VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    s.sql("CREATE VIEW test.ns.only_a AS SELECT id FROM test.ns.t WHERE kind = 'a'")
    assert {r.id for r in s.sql("SELECT * FROM test.ns.only_a").collect()} == {1, 3}
    # view over a view
    s.sql("CREATE VIEW test.ns.only_a_top AS SELECT max(id) AS m FROM test.ns.only_a")
    assert s.sql("SELECT * FROM test.ns.only_a_top").collect()[0].m == 3
    s.sql("CREATE OR REPLACE VIEW test.ns.only_a AS SELECT id FROM test.ns.t WHERE kind = 'b'")
    assert {r.id for r in s.sql("SELECT * FROM test.ns.only_a").collect()} == {2}
    s.sql("DROP VIEW test.ns.only_a_top")
    with pytest.raises(ValueError, match="no such view"):
        s.sql("DROP VIEW test.ns.only_a_top")

    # table rename works through SQL on the JDBC catalog
    s.sql("ALTER TABLE test.ns.t RENAME TO t_renamed")
    assert s.sql("SELECT * FROM test.ns.t_renamed").count() == 3

    # FS catalog refuses view DDL and rename, like the reference's Hadoop catalog
    fs_sess = RelativeSqlSession(spark, tf.mkdtemp(prefix="fswh_"), "test")
    fs_sess.sql("CREATE NAMESPACE test.ns")
    fs_sess.sql("CREATE TABLE test.ns.t (id bigint)")
    with pytest.raises(ValueError, match="JDBC"):
        fs_sess.sql("CREATE VIEW test.ns.v AS SELECT * FROM test.ns.t")
    with pytest.raises(NotImplementedError):
        fs_sess.sql("ALTER TABLE test.ns.t RENAME TO t2")


def test_drop_table_and_namespace(sess):
    sess.sql("CREATE NAMESPACE test.tmp")
    sess.sql("CREATE TABLE test.tmp.t (x int)")
    sess.sql("DROP TABLE test.tmp.t PURGE")
    assert sess.sql("SHOW TABLES IN test.tmp").count() == 0
    sess.sql("DROP NAMESPACE test.tmp")
    assert ("tmp",) not in sess.catalog.list_namespaces()


def test_alter_partition_field_evolves_spec(sess):
    _readme_flow(sess)
    sess.sql("ALTER TABLE test.my_ns.my_table ADD PARTITION FIELD category")
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')")
    table = sess._table(("my_ns",), "my_table")
    assert table.partition_spec == ["category"]
    # mixed-era read: pre-evolution rows + hive-laid-out new row
    out = sess.sql("SELECT id, category FROM test.my_ns.my_table")
    assert {(r.id, r.category) for r in out.collect()} == {
        (1, "odd"), (2, "even"), (3, "odd"),
    }
    sess.sql("ALTER TABLE test.my_ns.my_table DROP PARTITION FIELD category")
    table.ops._should_refresh = True
    assert table.partition_spec == []


def test_hidden_partitioning_through_sql(sess):
    sess.sql("CREATE NAMESPACE test.hp")
    sess.sql(
        "CREATE TABLE test.hp.ev (id bigint, ts string, kind string) "
        "PARTITIONED BY (day(ts), bucket(4, id))"
    )
    sess.sql(
        "INSERT INTO test.hp.ev VALUES "
        "(1, '2024-03-01 01:00:00', 'a'), (2, '2024-03-02 02:00:00', 'b'), "
        "(3, '2024-03-02 03:00:00', 'a')"
    )
    out = sess.sql("SELECT id FROM test.hp.ev WHERE ts >= '2024-03-02'")
    assert {r.id for r in out.collect()} == {2, 3}
    table = sess._table(("hp",), "ev")
    days = {f["partition"]["ts_day"] for f in table.scan_files()}
    assert days == {"2024-03-01", "2024-03-02"}
    pruned = table.scan_files(column_ranges={"ts": ("2024-03-02", None)})
    assert {f["partition"]["ts_day"] for f in pruned} == {"2024-03-02"}


def test_ref_reads_and_refs_table_through_sql(sess):
    _readme_flow(sess)
    sess.sql("CALL test.system.create_tag('my_ns.my_table', 'v1')")
    sess.sql("CALL test.system.create_branch('my_ns.my_table', 'audit')")
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')")
    # tag pinned at 2 rows while main moved to 3
    assert sess.sql("SELECT * FROM test.my_ns.my_table VERSION AS OF 'v1'").count() == 2
    assert sess.sql("SELECT * FROM test.my_ns.my_table").count() == 3
    refs = {(r.name, r.type): r.snapshot_id
            for r in sess.sql("SELECT * FROM test.my_ns.my_table.refs").collect()}
    assert ("v1", "TAG") in refs and ("audit", "BRANCH") in refs and ("main", "BRANCH") in refs
    # branch read resolves through the same VERSION AS OF syntax
    assert sess.sql("SELECT * FROM test.my_ns.my_table VERSION AS OF 'audit'").count() == 2


def test_table_properties_ddl(sess):
    _readme_flow(sess)
    sess.sql(
        "ALTER TABLE test.my_ns.my_table SET TBLPROPERTIES "
        "('write.metadata.compression' = 'gzip', 'owner' = 'etl')"
    )
    props = {r.key: r.value
             for r in sess.sql("SHOW TBLPROPERTIES test.my_ns.my_table").collect()}
    assert props["owner"] == "etl"
    assert props["write.metadata.compression"] == "gzip"
    # the compression property takes effect on the NEXT metadata commit
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')")
    table = sess._table(("my_ns",), "my_table")
    vs = [fi.location for fi in table.ops.io.list_prefix(table.ops.metadata_dir)
          if ".metadata.json" in fi.location]
    assert any(v.endswith(".gz.metadata.json") for v in vs)
    assert sess.sql("SELECT * FROM test.my_ns.my_table").count() == 3
    sess.sql("ALTER TABLE test.my_ns.my_table UNSET TBLPROPERTIES ('owner')")
    props = {r.key: r.value
             for r in sess.sql("SHOW TBLPROPERTIES test.my_ns.my_table").collect()}
    assert "owner" not in props


def test_write_ordered_by_clusters_next_write(sess):
    _readme_flow(sess)
    sess.sql("ALTER TABLE test.my_ns.my_table WRITE ORDERED BY (id)")
    table = sess._table(("my_ns",), "my_table")
    table.ops._should_refresh = True
    assert table.ops.current()["sort-order"] == ["id"]
    sess.sql("INSERT INTO test.my_ns.my_table VALUES (7, 'g', 'odd'), (8, 'h', 'even')")
    assert sess.sql("SELECT * FROM test.my_ns.my_table").count() == 4


def test_merge_matched_delete(sess):
    _readme_flow(sess)
    sess.sql(
        "MERGE INTO test.my_ns.my_table t "
        "USING (SELECT 1 AS id, 'x' AS data, 'odd' AS category "
        "       UNION ALL SELECT 9, 'nine', 'odd') s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {(r.id, r.data)
            for r in sess.sql("SELECT id, data FROM test.my_ns.my_table").collect()}
    # id=1 matched => deleted; id=9 unmatched => inserted; id=2 untouched
    assert rows == {(2, "b"), (9, "nine")}


def test_delete_mode_merge_on_read(sess):
    _readme_flow(sess)
    sess.sql(
        "ALTER TABLE test.my_ns.my_table SET TBLPROPERTIES "
        "('write.delete.mode' = 'merge-on-read')"
    )
    table = sess._table(("my_ns",), "my_table")
    files_before = {f["path"] for f in table.scan_files()}
    sess.sql("DELETE FROM test.my_ns.my_table WHERE id = 1")
    table.ops._should_refresh = True
    # same data files: the delete was a key file, not a rewrite
    assert {f["path"] for f in table.scan_files()} == files_before
    assert [r.id for r in sess.sql(
        "SELECT id FROM test.my_ns.my_table ORDER BY id").collect()] == [2]


def test_update_mode_merge_on_read(sess):
    _readme_flow(sess)
    sess.sql(
        "ALTER TABLE test.my_ns.my_table SET TBLPROPERTIES "
        "('write.update.mode' = 'merge-on-read')"
    )
    sess.sql("UPDATE test.my_ns.my_table SET data = upper(data) WHERE id = 1")
    rows = {(r.id, r.data)
            for r in sess.sql("SELECT id, data FROM test.my_ns.my_table").collect()}
    assert rows == {(1, "A"), (2, "b")}


def test_alter_column_type_widening(sess, spark):
    sess.sql("CREATE NAMESPACE test.tw")
    sess.sql("CREATE TABLE test.tw.t (id int, v float)")
    sess.sql("INSERT INTO test.tw.t VALUES (1, 1.5)")
    sess.sql("ALTER TABLE test.tw.t ALTER COLUMN id TYPE bigint")
    sess.sql("ALTER TABLE test.tw.t ALTER COLUMN v TYPE double")
    out = sess.sql("SELECT * FROM test.tw.t")
    assert dict(out.dtypes) == {"id": "bigint", "v": "double"}
    assert [(r.id, r.v) for r in out.collect()] == [(1, 1.5)]


def test_partitions_metadata_table(sess):
    sess.sql("CREATE NAMESPACE test.pm")
    sess.sql("CREATE TABLE test.pm.ev (id bigint, kind string) PARTITIONED BY (kind)")
    sess.sql("INSERT INTO test.pm.ev VALUES (1, 'click'), (2, 'view'), (3, 'click')")
    rows = {r.partition: (r.file_count, r.row_count)
            for r in sess.sql("SELECT * FROM test.pm.ev.partitions").collect()}
    assert rows['{"kind": "click"}'] == (1, 2)
    assert rows['{"kind": "view"}'] == (1, 1)


def test_manifests_metadata_table(sess):
    sess.sql("CREATE NAMESPACE test.mm")
    sess.sql("CREATE TABLE test.mm.t (id bigint, kind string)")
    sess.sql("INSERT INTO test.mm.t VALUES (1, 'a')")
    sess.sql("INSERT INTO test.mm.t VALUES (2, 'b')")
    rows = sess.sql("SELECT * FROM test.mm.t.manifests").collect()
    assert [(r.snapshot_id, r.operation) for r in rows] == [
        (1, "append"),
        (2, "append"),
    ]
    assert all(r.length > 0 and r.added_data_files >= 1 for r in rows)


def test_insert_overwrite_dynamic_mode(sess):
    sess.sql("CREATE NAMESPACE test.dpo")
    sess.sql("CREATE TABLE test.dpo.t (id bigint, day string) PARTITIONED BY (day)")
    sess.sql("INSERT INTO test.dpo.t VALUES (1, 'd1'), (2, 'd2')")
    sess.sql(
        "ALTER TABLE test.dpo.t SET TBLPROPERTIES ('write.overwrite.mode' = 'dynamic')"
    )
    sess.sql("INSERT OVERWRITE test.dpo.t VALUES (9, 'd1')")
    rows = {(r.id, r.day) for r in sess.sql("SELECT * FROM test.dpo.t").collect()}
    assert rows == {(9, "d1"), (2, "d2")}  # d2 untouched


def test_call_rewrite_manifests(spark, tmp_path):
    from iceberg_relative_io_spark.catalog import RelativeSqlSession

    s = RelativeSqlSession(spark, str(tmp_path / "rm_sql_wh"), "test")
    s.sql("CREATE NAMESPACE test.ns")
    s.sql("CREATE TABLE test.ns.t (id bigint)")
    for i in range(3):
        s.sql(f"INSERT INTO test.ns.t VALUES ({i})")
    out = s.sql("CALL test.system.rewrite_manifests('ns.t')").collect()
    assert len(out) == 1 and out[0].result.isdigit()
    got = sorted(r.id for r in s.sql("SELECT id FROM test.ns.t").collect())
    assert got == [0, 1, 2]


def test_call_create_changelog_view(sess):
    """CALL cat.system.create_changelog_view registers the CDC net diff
    between two snapshots as a temp view (Iceberg's procedure shape),
    queryable through plain spark.sql."""
    _readme_flow(sess)
    tops = sess.catalog.load_table(("my_ns",), "my_table")
    s1 = tops.current()["current-snapshot-id"]
    sess.sql(
        "INSERT INTO test.my_ns.my_table VALUES (3, 'c', 'odd')"
    )
    sess.sql("DELETE FROM test.my_ns.my_table WHERE id = 1")
    out = sess.sql(
        f"CALL test.system.create_changelog_view('my_ns.my_table', {s1})"
    )
    view = out.collect()[0][0]
    assert view == "my_table_changes"
    got = {
        (r.id, r.data, r._change_type, r._n)
        for r in sess.spark.sql(f"SELECT * FROM {view}").collect()
    }
    assert got == {
        (3, "c", "INSERT", 1),
        (1, "a", "DELETE", 1),
    }
    # explicit view name + endpoint
    tops.refresh()
    head = tops.current()["current-snapshot-id"]
    out2 = sess.sql(
        "CALL test.system.create_changelog_view("
        f"'my_ns.my_table', {s1}, {head}, 'cl_v2')"
    )
    assert out2.collect()[0][0] == "cl_v2"
    assert sess.spark.sql("SELECT count(*) AS n FROM cl_v2").collect()[0].n == 2


def test_call_release_session_caches(sess, spark, sf_dir):
    """Round-11: the long-session cache-lifecycle hook is reachable from
    pure SQL — CALL cat.system.release_session_caches() unpersists and
    clears every registered session cache (warehouse parity with
    bench.py / scaling_study.py calling the Python hook directly)."""
    from iceberg_relative_io_spark import caches
    from iceberg_relative_io_spark.operators import northstar

    # populate a real registered cache (LSH featurization persists)
    northstar.q_lsh_candidate_pairs(spark, sf_dir).count()
    assert caches.persisted_count() > 0
    res = sess.sql("CALL test.system.release_session_caches()").collect()
    assert len(res) == 1 and res[0].result.isdigit()
    assert int(res[0].result) > 0
    assert caches.persisted_count() == 0
    # idempotent: a second call releases nothing and still succeeds
    res2 = sess.sql("CALL test.system.release_session_caches()").collect()
    assert res2[0].result == "0"
    # unknown no-arg procedures are refused, not silently ignored
    import pytest as _pytest
    from iceberg_relative_io_spark.catalog.sql_frontend import SqlParseError

    with _pytest.raises(SqlParseError, match="unknown procedure"):
        sess.sql("CALL test.system.no_such_proc()")
