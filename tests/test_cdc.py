"""CDC MERGE semantics: last-wins election, tombstones, inserts,
cross-partition resolution, static-mode replay idempotency,
compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.streaming import cdc as CDC

BASE_SCHEMA = "k long, v string, n long"


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], BASE_SCHEMA
    )


def _ch(spark, rows):
    return spark.createDataFrame(rows, BASE_SCHEMA + ", seq long, op string")


def test_apply_changeset_merge_semantics(spark):
    base = _base(spark)
    changes = _ch(
        spark,
        [
            (2, "b2", 21, 1, "upsert"),
            (2, "b3", 22, 2, "upsert"),   # last change to key 2 wins
            (3, None, 0, 1, "delete"),    # tombstone
            (9, "new", 90, 1, "upsert"),  # brand-new key (insert)
            (1, None, 0, 1, "delete"),
            (1, "a2", 11, 2, "upsert"),   # delete then re-create
        ],
    )
    out = {r.k: (r.v, r.n) for r in CDC.apply_changeset(base, changes, "k").collect()}
    assert out == {1: ("a2", 11), 2: ("b3", 22), 9: ("new", 90)}


def test_read_snapshot_resolves_across_partitions(spark, tmp_path):
    base = _base(spark)
    state = str(tmp_path / "state")
    # no deltas yet -> base unchanged
    assert {r.k for r in CDC.read_snapshot(spark, base, state, "k").collect()} == {1, 2, 3}
    cols = base.columns
    CDC.process_batch(_ch(spark, [(2, "b2", 21, 1, "upsert")]), 0, state, cols)
    CDC.process_batch(
        _ch(spark, [(2, None, 0, 1, "delete"), (4, "d", 40, 2, "upsert")]),
        1, state, cols,
    )
    out = {r.k: (r.v, r.n) for r in CDC.read_snapshot(spark, base, state, "k").collect()}
    # batch 1's delete of key 2 outranks batch 0's upsert; key 4 inserted
    assert out == {1: ("a", 10), 3: ("c", 30), 4: ("d", 40)}


def test_cdc_replay_idempotent_under_static_mode(spark, tmp_path):
    # FORCE static (other suite tests may leave the shared session at
    # dynamic): the per-writer option must win regardless
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        base = _base(spark)
        state = str(tmp_path / "state")
        cols = base.columns
        CDC.process_batch(_ch(spark, [(1, "x", 1, 1, "upsert")]), 0, state, cols)
        CDC.process_batch(_ch(spark, [(2, "y", 2, 1, "upsert")]), 1, state, cols)
        once = {r.k: r.v for r in CDC.read_snapshot(spark, base, state, "k").collect()}
        # replay batch 0: batch 1's delta partition must survive
        CDC.process_batch(_ch(spark, [(1, "x", 1, 1, "upsert")]), 0, state, cols)
        twice = {r.k: r.v for r in CDC.read_snapshot(spark, base, state, "k").collect()}
        assert once == twice == {1: "x", 2: "y", 3: "c"}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_compact_snapshot_equals_merge_on_read(spark, tmp_path):
    base = _base(spark)
    state = str(tmp_path / "state")
    cols = base.columns
    CDC.process_batch(
        _ch(spark, [(3, None, 0, 1, "delete"), (5, "e", 50, 2, "upsert")]),
        0, state, cols,
    )
    snap_dir = str(tmp_path / "snap")
    CDC.compact_snapshot(spark, base, state, snap_dir, "k")
    compacted = {
        r.k: (r.v, r.n) for r in spark.read.parquet(snap_dir).collect()
    }
    live = {
        r.k: (r.v, r.n)
        for r in CDC.read_snapshot(spark, base, state, "k").collect()
    }
    assert compacted == live and 3 not in compacted and compacted[5] == ("e", 50)


def test_time_travel_reads_prior_versions(spark, tmp_path):
    base = _base(spark)
    state = str(tmp_path / "state")
    cols = base.columns
    CDC.process_batch(_ch(spark, [(1, "x", 1, 1, "upsert")]), 0, state, cols)
    CDC.process_batch(_ch(spark, [(1, None, 0, 1, "delete")]), 1, state, cols)
    v_base = {r.k: r.v for r in CDC.read_snapshot(spark, base, state, "k", as_of_batch=-1).collect()}
    v0 = {r.k: r.v for r in CDC.read_snapshot(spark, base, state, "k", as_of_batch=0).collect()}
    v1 = {r.k: r.v for r in CDC.read_snapshot(spark, base, state, "k").collect()}
    assert v_base == {1: "a", 2: "b", 3: "c"}
    assert v0 == {1: "x", 2: "b", 3: "c"}
    assert v1 == {2: "b", 3: "c"}


def test_snapshot_changes_classification(spark, tmp_path):
    base = _base(spark)
    state = str(tmp_path / "state")
    cols = base.columns
    CDC.process_batch(
        _ch(
            spark,
            [
                (1, "a", 10, 1, "upsert"),   # no-op rewrite: same payload
                (2, "b2", 21, 1, "upsert"),  # update
                (3, None, 0, 1, "delete"),   # delete
                (9, "new", 90, 1, "upsert"), # insert
            ],
        ),
        0, state, cols,
    )
    feed = {
        r.k: r.change
        for r in CDC.snapshot_changes(spark, base, state, "k", from_batch=-1).collect()
    }
    # identical-payload rewrite of key 1 is NOT a change
    assert feed == {2: "updated", 3: "deleted", 9: "inserted"}
