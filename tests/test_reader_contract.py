"""Snapshot reader CONFORMANCE suite (round-5; VERDICT r4 item 6).

SURVEY §1.4 promises the engine reads tables "through a thin SnapshotReader
so real Iceberg is a config swap".  This module pins the *interface* that
swap must honor, independent of the parquet+JSON emulation: every test
drives only the public reader surface (constructor with snapshot_id / ref,
load, load_ranges, load_bloom, blocks, load_block_limit, incremental_files,
load_incremental) plus the writer/catalog operations that produce the
lineage (write_snapshot with base, set_ref/resolve_ref/list_refs,
list_snapshots, delete_snapshot) — a real Iceberg-catalog implementation
has to pass this file unchanged, with only the construction swapped.

The table under test is a synthetic multi-commit lineage built once per
module:

  v1 (tagged `audit-v1`)   ids 0..99,      cols (id, v),      2 files
  v2 = v1 + append          ids 100..199,   same cols,         2 files
  v3 = v2 + ADD COLUMN      ids 200..249,   cols (id, v, extra)
  v4 = v3 + MOR DELETE      equality-deletes ids {7, 103}

Contract clauses, one test each, with the Iceberg spec concept they mirror:
snapshot isolation / time travel, named refs (tags immutable, branches
movable), snapshot-pinned schema on read (add-column evolution), pruning
as a SUPERSET guarantee (bounds and bloom), deterministic key-range work
units, incremental append scans (manifest diff), and merge-on-read
equality-delete application bounded by commit sequence.
"""

import os

import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.sources.snapshot import (
    SnapshotReader,
    delete_snapshot,
    list_refs,
    list_snapshots,
    resolve_ref,
    set_ref,
    write_snapshot,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("contract") / "tbl")

    def rows(lo, hi, extra=False):
        df = spark.range(lo, hi).select(
            F.col("id"), (F.col("id") * 7 % 1000).alias("v")
        )
        if extra:
            df = df.withColumn("extra", (F.col("id") % 5).cast("bigint"))
        return df.repartitionByRange(2, "id")

    v1 = write_snapshot(
        rows(0, 100), path, snapshot_id="snap-v1",
        bounds_cols=["id"], bloom_cols=["id"],
    )
    set_ref(path, "audit-v1", "snap-v1", kind="tag")
    v2 = write_snapshot(
        rows(100, 200), path, snapshot_id="snap-v2", base=v1,
        bounds_cols=["id"], bloom_cols=["id"],
    )
    set_ref(path, "main", "snap-v2", kind="branch")
    v3 = write_snapshot(
        rows(200, 250, extra=True), path, snapshot_id="snap-v3", base=v2,
        bounds_cols=["id"], bloom_cols=["id"],
    )
    delete_snapshot(
        spark, path,
        spark.createDataFrame([(7,), (103,)], "id: bigint"), "id",
        snapshot_id="snap-v4", base_snapshot_id="snap-v3",
    )
    return path


def test_lineage_listing_is_commit_ordered(table):
    assert list_snapshots(table) == ["snap-v1", "snap-v2", "snap-v3", "snap-v4"]


def test_default_read_is_latest_snapshot(spark, table):
    r = SnapshotReader(table)
    assert r.snapshot_id == "snap-v4"
    # 250 rows minus the two MOR-deleted keys
    assert r.load(spark).count() == 248


def test_time_travel_snapshot_isolation(spark, table):
    """A pinned snapshot id always reproduces that commit's exact rows,
    bit-for-bit, regardless of later appends/deletes (Iceberg time travel:
    data files are immutable and shared)."""
    ids = lambda sid: sorted(
        r["id"] for r in SnapshotReader(table, sid).load(spark).collect()
    )
    assert ids("snap-v1") == list(range(100))
    assert ids("snap-v2") == list(range(200))
    assert ids("snap-v3") == list(range(250))
    assert ids("snap-v4") == [i for i in range(250) if i not in (7, 103)]


def test_tag_is_immutable_branch_is_movable(spark, table):
    assert resolve_ref(table, "audit-v1") == "snap-v1"
    assert SnapshotReader(table, ref="audit-v1").load(spark).count() == 100
    with pytest.raises(ValueError):
        set_ref(table, "audit-v1", "snap-v2", kind="tag")
    # branches fast-forward: one metadata write re-points the name
    set_ref(table, "main", "snap-v3", kind="branch")
    assert resolve_ref(table, "main") == "snap-v3"
    kinds = {k: v["kind"] for k, v in list_refs(table).items()}
    assert kinds == {"audit-v1": "tag", "main": "branch"}


def test_constructor_rejects_id_plus_ref(table):
    with pytest.raises(ValueError):
        SnapshotReader(table, "snap-v1", ref="audit-v1")


def test_schema_is_snapshot_pinned(spark, table):
    """Reads happen under the SNAPSHOT's schema: a pre-evolution snapshot
    never shows the later column; a post-evolution snapshot fills it with
    NULL for pre-evolution files (add-column without rewrite)."""
    old = SnapshotReader(table, "snap-v2").load(spark)
    assert old.columns == ["id", "v"]
    new = SnapshotReader(table, "snap-v3").load(spark)
    assert new.columns == ["id", "v", "extra"]
    n_null = new.filter("extra IS NULL").count()
    assert n_null == 200  # exactly the pre-evolution rows
    assert new.filter("extra IS NOT NULL").count() == 50


def test_bounds_pruning_is_a_superset(spark, table):
    """prune/load_ranges may read extra files but never lose rows: the
    residual-filtered result equals the exact full-scan filter."""
    r = SnapshotReader(table, "snap-v3")
    got = sorted(
        x["id"]
        for x in r.load_ranges(spark, "id", [(10, 20), (180, 210)])
        .filter("(id BETWEEN 10 AND 20) OR (id BETWEEN 180 AND 210)")
        .collect()
    )
    assert got == list(range(10, 21)) + list(range(180, 211))
    # and it actually pruned: fewer files than the full snapshot
    assert len(r.prune_ranges("id", [(10, 20)])) < len(r.snapshot.files)


def test_bloom_pruning_superset_and_exact_miss(spark, table):
    r = SnapshotReader(table, "snap-v3")
    hit = r.load_bloom(spark, "id", [42]).filter("id = 42")
    assert hit.count() == 1
    # a value outside the domain: blooms have no false negatives, so the
    # zero-file path must return an EMPTY frame under the pinned schema
    miss = r.load_bloom(spark, "id", [10**12 + 7])
    assert miss.columns == ["id", "v", "extra"]
    assert miss.count() == 0


def test_blocks_are_a_deterministic_domain_prefix(spark, table):
    """Key-range work units: "first N of K blocks" must equal the domain
    prefix's exact rows, independent of file layout."""
    r = SnapshotReader(table, "snap-v3")
    blks = r.blocks("id", 5, 250)
    assert [(b["block"], b["lo"], b["hi"]) for b in blks] == [
        (0, 0, 49), (1, 50, 99), (2, 100, 149), (3, 150, 199), (4, 200, 249)
    ]
    got = sorted(
        x["id"] for x in r.load_block_limit(spark, "id", 5, 2, 250).collect()
    )
    assert got == list(range(100))


def test_incremental_scan_is_the_manifest_diff(spark, table):
    """An append-only incremental read between two snapshots returns
    exactly the appended rows, touching only the delta's files."""
    r = SnapshotReader(table, "snap-v3")
    delta_files = r.incremental_files("snap-v1")
    assert 0 < len(delta_files) < len(r.snapshot.files)
    got = sorted(
        x["id"] for x in r.load_incremental(spark, "snap-v1").collect()
    )
    assert got == list(range(100, 250))


def test_mor_delete_applies_only_to_older_files(spark, table):
    """Equality deletes bind to commit sequence: rows re-appended AFTER the
    delete commit are immune even on key collision."""
    v4 = SnapshotReader(table, "snap-v4").snapshot
    re_add = write_snapshot(
        spark.createDataFrame([(7, 49)], "id: bigint, v: bigint"),
        table, snapshot_id="snap-v5", base=v4, bounds_cols=["id"],
    )
    assert re_add is not None
    got = SnapshotReader(table, "snap-v5").load(spark)
    assert got.filter("id = 7").count() == 1     # the NEW row survives
    assert got.filter("id = 103").count() == 0   # old delete still applies
    # history unchanged behind the new commit
    assert SnapshotReader(table, "snap-v4").load(spark).filter(
        "id = 7"
    ).count() == 0


def test_reader_surface_is_complete():
    """The conformance surface a real catalog implementation must provide."""
    for method in (
        "load", "load_ranges", "load_bloom", "load_incremental",
        "prune", "prune_ranges", "prune_bloom", "blocks",
        "load_block_limit", "incremental_files",
    ):
        assert callable(getattr(SnapshotReader, method)), method
