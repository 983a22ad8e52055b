"""Bit-level parity: Spark engine synthesis vs independent DuckDB evaluation.

This is the foundation of every oracle check — the two engines must derive
the identical spans/geometry from the identical driver parquet.
"""

import numpy as np

from fast_carpenter_spark import synth


def _spark_pdf(spark, sql):
    return spark.sql(sql).toPandas()


def _duck_pdf(duck, sql):
    return duck.execute(sql).df()


def _compare(sdf, ddf, keys):
    sdf = sdf.sort_values(keys).reset_index(drop=True)
    ddf = ddf.sort_values(keys).reset_index(drop=True)
    assert len(sdf) == len(ddf)
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        a, b = sdf[c].values, ddf[c].values
        if a.dtype.kind == "f":
            assert (np.asarray(a) == np.asarray(b)).all(), f"double column {c} differs"
        else:
            assert (a == b).all(), f"column {c} differs"


def test_flat_spans_bit_identical(spark, docs, duck):
    sdf = _spark_pdf(spark, synth.flat_spans_sql("spark"))
    ddf = _duck_pdf(duck, synth.flat_spans_sql("duck"))
    _compare(sdf, ddf, ["doc_id", "span_idx"])
    # hot docs exist and carry 48 spans
    hot = sdf[sdf.doc_id % 100 == 0]
    assert set(hot.groupby("doc_id").size()) == {48}


def test_spans_table_schema_and_invariant(spark, docs, duck):
    sdf = spark.sql(synth.spans_table_sql("spark"))
    assert [f.name for f in sdf.schema["spans"].dataType.elementType.fields] == [
        "kind", "text", "media_ref", "offset",
    ]
    row = sdf.filter("doc_id = 'doc_000000000001'").collect()[0]
    offs = [s["offset"] for s in row.spans]
    assert offs == sorted(offs)  # strictly increasing offsets
    assert len(row.spans) == 2  # doc 1 -> 1 + 1%7 = 2 spans


def test_raster_parity(spark, duck):
    sdf = _spark_pdf(spark, synth.raster_sql("spark", 4))
    ddf = _duck_pdf(duck, synth.raster_sql("duck", 4))
    _compare(sdf, ddf, ["tile_id"])
    assert len(sdf) == 16 * 16


def test_polygon_values_parity(spark, duck):
    sq = f"SELECT poly_id, region, weight, ring_lon, ring_lat FROM {synth.polygons_values_sql('spark')}"
    dq = f"SELECT poly_id, region, weight, ring_lon, ring_lat FROM {synth.polygons_values_sql('duck')}"
    sdf = _spark_pdf(spark, sq)
    ddf = _duck_pdf(duck, dq)
    sdf = sdf.sort_values("poly_id").reset_index(drop=True)
    ddf = ddf.sort_values("poly_id").reset_index(drop=True)
    for i in range(len(sdf)):
        assert list(sdf.ring_lon[i]) == list(ddf.ring_lon[i])
        assert list(sdf.ring_lat[i]) == list(ddf.ring_lat[i])
    assert (sdf.weight.values == ddf.weight.values).all()


def test_span_sequence_equality_through_stages(spark, docs):
    """input_hint per-row invariant: engine stages must preserve each
    document's span sequence exactly — (kind, text, media_ref, offset) in
    order — the analogue of the reference's rule that masks never reorder
    or truncate arrays (ref: tree_adapter.py:574-600 Masked keeps arrays
    intact)."""
    from fast_carpenter_spark.operators.define import DefineStage
    from fast_carpenter_spark.operators.selection import SelectPhaseSpaceStage

    nested = spark.sql(synth.spans_table_sql("spark"))
    before = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in nested.collect()}

    # Define adds a derived column; SelectPhaseSpace adds a region mask —
    # both must leave the spans column untouched, row-aligned, unreordered
    out = DefineStage.from_config(
        "d", [{"n_media": "0 + 1"}]
    ).apply(nested.withColumn("x", nested.doc_id.substr(5, 12).cast("long")))
    out = SelectPhaseSpaceStage(
        name="sp", selection="x % 2 == 0", region_name="even"
    ).apply(out)
    after = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in out.collect()}

    assert after == before  # same docs, same spans, same order, same fields
