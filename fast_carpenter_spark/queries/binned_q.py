"""Split from the original single-module queries.py (round-4 refactor); see queries/__init__.py for the public surface."""

from __future__ import annotations

from ._common import (
    BinnedDataframeStage,
    Dimension,
    F,
    REGION_RES,
    SystematicWeightsStage,
    _source_fingerprint_tag,
    flat_spans,
    grid,
    load_documents,
    synth,
)
from .tiles_q import (
    O_SPANS_FLAT,
)

# ---------------------------------------------------------------------------
# 6. classic BinnedDataframe on a scalar column + systematics + skim
# ---------------------------------------------------------------------------

_NCHARS_DIM = {"in": "n_chars", "out": "nchars_bin",
               "bins": {"nbins": 10, "low": 0.0, "high": 500.0}}


def q_binned_1d(spark, sf_dir):
    df = load_documents(spark, sf_dir).withColumn(
        "w", F.expr(synth.doc_weight_sql())
    )
    stage = BinnedDataframeStage(name="hist", binning=[_NCHARS_DIM], weights={"w": "w"})
    return stage.apply(df)


_dim = Dimension.from_config(_NCHARS_DIM)
O_BINNED_1D = f"""
WITH base AS (
  SELECT *, {synth.doc_weight_sql()} AS w,
         {_dim.index_sql('duck')} AS nchars_bin
  FROM documents
)
SELECT nchars_bin, count(*) AS n, sum(w) AS w_sumw, sum(w * w) AS w_sumw2,
       {_dim.lo_hi_sql('nchars_bin', 'duck')[0]} AS nchars_bin_lo,
       {_dim.lo_hi_sql('nchars_bin', 'duck')[1]} AS nchars_bin_hi
FROM base GROUP BY nchars_bin
"""


def q_binned_1d_padded(spark, sf_dir):
    """pad_missing densify (A6): every bin index appears, empty bins carry
    n=0 / sumw=0 (ref: binned_dataframe.py:103-114 densify_dataframe —
    reindex to the full product of bin edges)."""
    df = load_documents(spark, sf_dir).withColumn("w", F.expr(synth.doc_weight_sql()))
    stage = BinnedDataframeStage(
        name="hist", binning=[_NCHARS_DIM], weights={"w": "w"}, pad_missing=True
    )
    return stage.apply(df)


O_BINNED_1D_PADDED = f"""
WITH idxs AS (
  SELECT unnest(range(0, {len(_dim.edges) - 1})) AS nchars_bin
),
obs AS ({O_BINNED_1D})
SELECT i.nchars_bin,
       coalesce(o.n, 0) AS n,
       coalesce(o.w_sumw, 0.0) AS w_sumw,
       coalesce(o.w_sumw2, 0.0) AS w_sumw2,
       {_dim.lo_hi_sql('i.nchars_bin', 'duck')[0]} AS nchars_bin_lo,
       {_dim.lo_hi_sql('i.nchars_bin', 'duck')[1]} AS nchars_bin_hi
FROM idxs i LEFT JOIN obs o ON i.nchars_bin = o.nchars_bin
"""


def q_csv_roundtrip(spark, sf_dir):
    """K1 sink fidelity at driver grain: the binned histogram is exported
    through the CLI's ``%.17g`` CSV writer (ref: fast-carpenter's
    to_csv float_format, summary/binned_dataframe.py:14-51) and read BACK
    under the original schema.  17 significant digits round-trips IEEE754
    doubles exactly — including the ±inf open-ended bin edges — so the
    oracle is the same as binned_1d's: any loss in the sink breaks the
    value hash."""
    import os
    import tempfile

    res = q_binned_1d(spark, sf_dir)
    schema = res.schema
    pdf = res.toPandas()  # sink parity check: result is O(n_bins) rows
    path = os.path.join(
        tempfile.gettempdir(), f"fcs_csv_rt_{_source_fingerprint_tag(sf_dir)}.csv"
    )
    pdf.to_csv(path, index=False, float_format="%.17g")
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("positiveInf", "inf")
        .option("negativeInf", "-inf")
        .csv(path)
    )


def q_systematics(spark, sf_dir):
    df = load_documents(spark, sf_dir).withColumn("w", F.expr(synth.doc_weight_sql()))
    stage = SystematicWeightsStage(
        name="syst",
        weights={
            "scale": {"nominal": "w", "up": "w * 1.25", "down": "w * 0.75"},
            "trig": {"nominal": "CAST(1.0 AS DOUBLE)", "up": "CAST(1.0625 AS DOUBLE)"},
        },
    )
    return stage.apply(df).select(
        "doc_id", "weight_nominal", "weight_scale_up", "weight_scale_down", "weight_trig_up"
    )


O_SYSTEMATICS = f"""
SELECT doc_id,
       ({synth.doc_weight_sql()}) * 1.0 AS weight_nominal,
       (({synth.doc_weight_sql()}) * 1.25) * 1.0 AS weight_scale_up,
       (({synth.doc_weight_sql()}) * 0.75) * 1.0 AS weight_scale_down,
       ({synth.doc_weight_sql()}) * 1.0625 AS weight_trig_up
FROM documents
"""


def q_systematics_binned(spark, sf_dir):
    """Reference end-to-end workflow: systematic weight variations feeding
    the binned dataframe — per-(region-cell) sumw for nominal and each
    variation in ONE aggregation pass (ref: define/systematics.py:61-94
    building variations consumed by summary/binned_dataframe.py weights)."""
    df = flat_spans(spark, sf_dir)
    df = SystematicWeightsStage(
        name="syst",
        weights={"scale": {"nominal": "w", "up": "w * 1.25", "down": "w * 0.75"}},
    ).apply(df)
    df = df.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
    return BinnedDataframeStage(
        name="tiles",
        binning=[{"in": "cell"}],
        weights={
            "nominal": "weight_nominal",
            "scale_up": "weight_scale_up",
            "scale_down": "weight_scale_down",
        },
    ).apply(df)


O_SYSTEMATICS_BINNED = f"""
SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
       count(*) AS n,
       sum(w * 1.0) AS nominal_sumw,
       sum((w * 1.0) * (w * 1.0)) AS nominal_sumw2,
       sum((w * 1.25) * 1.0) AS scale_up_sumw,
       sum(((w * 1.25) * 1.0) * ((w * 1.25) * 1.0)) AS scale_up_sumw2,
       sum((w * 0.75) * 1.0) AS scale_down_sumw,
       sum(((w * 0.75) * 1.0) * ((w * 0.75) * 1.0)) AS scale_down_sumw2
FROM ({O_SPANS_FLAT})
GROUP BY 1
"""


def q_skim(spark, sf_dir):
    """Event-level skim (A10): masked projection of span collections."""
    from ..operators.skim import EventByEventDataframeStage

    df = flat_spans(spark, sf_dir)
    stage = EventByEventDataframeStage(
        name="skim",
        collections=["doc_id", "span_idx", "kind", "n_chars"],
        mask="n_chars > 300",
        flatten=False,
    )
    return stage.apply(df)


O_SKIM = f"""
SELECT doc_id, span_idx, kind, n_chars FROM ({O_SPANS_FLAT}) WHERE n_chars > 300
"""


