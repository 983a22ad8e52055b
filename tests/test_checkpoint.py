"""Checkpoint/resume: per-partition partials + counter lineage (north_rule).

Mirrors the reference's merge-protocol tests (ref:
tests/summary/test_binned_dataframe.py:118-181 multi-chunk merge;
tests/selection/test_stage.py Counter merge): the associative per-unit
partials must reproduce the single-shot result exactly, across a simulated
crash + restart.
"""

import json
import os

import pytest

from fast_carpenter_spark.checkpoint import CheckpointedRun, merge_metrics
from fast_carpenter_spark.queries import (
    CUTFLOW_SELECTION,
    CUTFLOW_WEIGHTS,
    flagship_unit_job,
    q_pip_tile_agg,
)
from fast_carpenter_spark.operators.selection import CutFlowStage
from fast_carpenter_spark.sources.snapshot import SnapshotReader, write_snapshot

from conftest import SF_DIR


@pytest.fixture(scope="module")
def snap_dir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt_snap"))
    write_snapshot(
        docs.repartition(4, "doc_id"), d, snapshot_id="snap-t", bounds_cols=["doc_id"]
    )
    return d


def rows_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_resume_equals_single_shot(spark, docs, snap_dir, tmp_path):
    reader = SnapshotReader(snap_dir)
    job = flagship_unit_job(spark)
    run_dir = str(tmp_path / "run")

    run = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    assert len(run.units) == 4
    s1 = run.execute(spark, max_units=2)  # simulated crash after 2 units
    assert len(s1["processed"]) == 2 and len(s1["pending"]) == 2

    # restart: fresh object, same run_dir — ledger skips completed units
    resumed = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    s2 = resumed.execute(spark)
    assert sorted(s2["skipped"]) == sorted(s1["processed"])
    assert len(s2["processed"]) == 2

    final, metrics = resumed.finalize(spark)
    expected = q_pip_tile_agg(spark, SF_DIR)
    assert rows_sorted(final) == rows_sorted(expected)

    # lineage metrics: per-unit docs sum to the table total, and the merged
    # cutflow counters equal the whole-table counters (Counter.add algebra)
    assert metrics["docs"] == docs.count()
    whole = {
        f"{r['cut']}|{r['count_type']}|{r['weight_name']}": r["value"]
        for r in CutFlowStage(
            name="cf", selection=CUTFLOW_SELECTION, weights=CUTFLOW_WEIGHTS
        )
        .counters(
            __import__("fast_carpenter_spark.queries", fromlist=["flat_spans"])
            .flat_spans(spark, SF_DIR)
        )
        .collect()
    }
    assert set(metrics["cutflow"]) == set(whole)
    for k, v in whole.items():
        assert metrics["cutflow"][k] == pytest.approx(v, rel=1e-12)

    # run manifest written with lineage + versions (bookkeeping analog)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest["lineage"]) == set(run.units)
    assert manifest["versions"]["pyspark"] == spark.version


def test_torn_ledger_line_redoes_unit(spark, snap_dir, tmp_path):
    reader = SnapshotReader(snap_dir)
    job = flagship_unit_job(spark)
    run_dir = str(tmp_path / "run")
    run = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    run.execute(spark)

    # tear the last ledger line (crash mid-append)
    with open(run.ledger_path) as f:
        lines = f.readlines()
    with open(run.ledger_path, "w") as f:
        f.writelines(lines[:-1])
        f.write(lines[-1][: len(lines[-1]) // 2])

    again = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    assert len(again.completed_units()) == 3
    s = again.execute(spark)
    assert len(s["processed"]) == 1  # only the torn unit redone
    final, _ = again.finalize(spark)
    assert rows_sorted(final) == rows_sorted(q_pip_tile_agg(spark, SF_DIR))


def test_finalize_requires_all_units(spark, snap_dir, tmp_path):
    reader = SnapshotReader(snap_dir)
    run = CheckpointedRun.from_snapshot(
        str(tmp_path / "run"), reader, flagship_unit_job(spark), files_per_unit=1
    )
    run.execute(spark, max_units=1)
    with pytest.raises(RuntimeError, match="not complete"):
        run.finalize(spark)


def test_merge_metrics_nested_sum():
    a = {"docs": 2, "cutflow": {"c1": 1.5}, "tag": "x"}
    b = {"docs": 3, "cutflow": {"c1": 0.5, "c2": 7}}
    m = merge_metrics(a, b)
    assert m == {"docs": 5, "cutflow": {"c1": 2.0, "c2": 7}, "tag": "x"}


def test_resume_rejects_stale_unit_layout(spark, docs, snap_dir, tmp_path):
    """A ledger written with a different files_per_unit (or snapshot) must
    NOT be treated as complete: unit ids collide but cover different files,
    so merging the old partials would silently corrupt the final result."""
    reader = SnapshotReader(snap_dir)
    job = flagship_unit_job(spark)
    run_dir = str(tmp_path / "run_stale")

    first = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    first.execute(spark, max_units=2)

    # same run_dir, different unit layout: u00000/u00001 ids exist in the
    # ledger but map to 2-file groups now — all units must be redone
    regrouped = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=2)
    assert regrouped.completed_units() == {}
    s = regrouped.execute(spark)
    assert len(s["processed"]) == 2 and not s["skipped"]

    final, _ = regrouped.finalize(spark)
    expected = q_pip_tile_agg(spark, SF_DIR)
    assert rows_sorted(final) == rows_sorted(expected)
