"""Skew-handling strategies must be result-identical to the baseline
(SURVEY.md §7 hard part 3): salting changes the shuffle shape, never the
rows.  The synthetic data plants hot docs (48 spans in one tiny area) and
two giant polygons precisely to exercise these paths."""

import pytest

from pyspark.sql import functions as F

from fast_carpenter_spark import synth
from fast_carpenter_spark.spatial.join import SpatialJoinStage
from fast_carpenter_spark.spatial.knn import knn_bounded, knn_local


@pytest.fixture(scope="module")
def spans(spark, docs):
    return spark.sql(synth.flat_spans_sql("spark"))


def rows_sorted(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_join_strategies_identical(spark, spans):
    polys = synth.polygons()
    cols = ["doc_id", "span_idx", "poly_id", "region"]
    base = rows_sorted(
        SpatialJoinStage(name="b", polygons=polys, strategy="broadcast").apply(spans), cols
    )
    salted = rows_sorted(
        SpatialJoinStage(name="s", polygons=polys, strategy="salted", nsalt=7).apply(spans),
        cols,
    )
    shuffled = rows_sorted(
        SpatialJoinStage(name="h", polygons=polys, strategy="shuffle").apply(spans), cols
    )
    hashed = rows_sorted(
        SpatialJoinStage(name="sh", polygons=polys, strategy="shuffle_hash").apply(spans),
        cols,
    )
    assert salted == base and shuffled == base and hashed == base and len(base) > 0


def test_knn_hot_cell_salting_identical(spark, spans):
    pts = spans.filter("span_idx = 0").select("doc_id", "lon", "lat")
    cols = ["doc_id", "neighbor_id", "rank", "dist2"]
    base = rows_sorted(knn_bounded(pts, res=5, ring=1, k=3), cols)
    # hot_threshold=1 forces EVERY populated cell through the salted path
    forced = rows_sorted(
        knn_local(pts, res=5, ring=1, k=3, hot_threshold=1, nsalt=5), cols
    )
    normal = rows_sorted(knn_local(pts, res=5, ring=1, k=3), cols)
    assert forced == base and normal == base and len(base) > 0


def test_pip_refine_udf_matches_sql(spark, spans):
    """The Arrow numpy PIP kernel and the codegen SQL refine agree."""
    polys = synth.polygons()
    cols = ["doc_id", "span_idx", "poly_id"]
    via_sql = rows_sorted(
        SpatialJoinStage(name="a", polygons=polys, refine="sql").apply(spans), cols
    )
    via_udf = rows_sorted(
        SpatialJoinStage(name="b", polygons=polys, refine="udf").apply(spans), cols
    )
    assert via_sql == via_udf and len(via_sql) > 0
