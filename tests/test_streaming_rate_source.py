"""Non-file streaming source proof: the documented ``format()`` swap.

The streaming modules read a parquet file source by default and document
Kafka / Iceberg-CDC as "a format() swap".  This test makes that claim
concrete with Spark's built-in ``rate`` source (zero external services):
rate rows (value 0,1,2,...) are mapped to documents-schema rows with the
same deterministic expressions the batch engine uses, streamed through
``StreamingTileAgg`` unmodified, and the merged delta table must equal a
batch computation over the identical doc_id prefix.

Two determinism anchors make the comparison exact with no progress-event
races:

* the rate source delivers value 0..M-1 in order, each micro-batch a
  contiguous range, so the set of COMPLETE delta batches (dirs with a
  ``_SUCCESS`` marker — ``query.stop()`` may interrupt the final write)
  covers exactly a doc-id prefix;
* the per-doc span count is deterministic and strictly cumulative, so the
  merged span total inverts to a unique prefix length M.
"""

import glob
import os
import time
import uuid

import pytest

from fast_carpenter_spark.streaming.tile_stream import StreamingTileAgg

# documents-schema projection from the rate source's value column; the
# batch twin applies the same expressions to spark.range(M)
DOC_EXPRS = [
    "CAST(value AS BIGINT) AS doc_id",
    "repeat('abcdefgh', 96) AS text",
    "concat('l', CAST(value % 4 AS STRING)) AS lang",
    "concat('s', CAST(value % 7 AS STRING)) AS source",
    "CAST(64 + value % 512 AS INT) AS n_chars",
]


def _nspans(doc_id: int) -> int:
    return 48 if doc_id % 100 == 0 else doc_id % 7 + 1


def _invert_prefix(total_spans: int) -> int:
    """Find M with sum_{d<M} nspans(d) == total_spans (unique: the
    cumulative sum is strictly increasing)."""
    acc, d = 0, 0
    while acc < total_spans:
        acc += _nspans(d)
        d += 1
    assert acc == total_spans, (
        f"merged span count {total_spans} is not a doc-id prefix sum"
    )
    return d


def test_rate_source_format_swap(spark, tmp_path):
    out = str(tmp_path / f"rate_out_{uuid.uuid4().hex[:8]}")
    ckpt = str(tmp_path / "rate_ckpt")
    agg = StreamingTileAgg(name="rate_swap", res=6, out_dir=out, checkpoint_dir=ckpt)

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20000)
        .load()
        .selectExpr(*DOC_EXPRS)
    )
    query = agg.start(spark, stream=rate, available_now=False)
    progressed = 0
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(0.5)
            progressed = sum(int(p["numInputRows"]) for p in query.recentProgress)
            if progressed >= 5000:
                break
        assert progressed >= 1, "rate source produced no rows within budget"
    finally:
        query.stop()
        query.awaitTermination(30)

    # complete batches only: stop() can interrupt the in-flight delta write
    complete = sorted(
        (d for d in glob.glob(os.path.join(agg.deltas_dir, "batch=*"))
         if os.path.exists(os.path.join(d, "_SUCCESS"))),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )
    assert complete, "no complete micro-batch deltas were committed"
    batch_ids = [int(d.rsplit("=", 1)[1]) for d in complete]
    assert batch_ids == list(range(len(batch_ids))), (
        f"committed batches are not a contiguous prefix: {batch_ids}"
    )
    merged = (
        spark.read.parquet(*complete)
        .groupBy("cell")
        .agg({"n": "sum", "w_sumw": "sum", "w_sumw2": "sum"})
        .withColumnRenamed("sum(n)", "n")
        .withColumnRenamed("sum(w_sumw)", "w_sumw")
        .withColumnRenamed("sum(w_sumw2)", "w_sumw2")
        .collect()
    )
    total_spans = sum(r["n"] for r in merged)
    assert total_spans > 0
    m = _invert_prefix(total_spans)

    batch_docs = (
        spark.range(m).withColumnRenamed("id", "value").selectExpr(*DOC_EXPRS)
    )
    expected = {
        r["cell"]: (r["n"], r["w_sumw"], r["w_sumw2"])
        for r in agg._tile_partial(batch_docs).collect()
    }
    got = {r["cell"]: (r["n"], r["w_sumw"], r["w_sumw2"]) for r in merged}
    assert set(got) == set(expected)
    for cell, (n, w1, w2) in expected.items():
        gn, gw1, gw2 = got[cell]
        assert gn == n, f"cell {cell}: n {gn} != {n}"
        # weights are binary fractions by construction: sums are exact
        assert gw1 == w1 and gw2 == w2, f"cell {cell}: weight sums differ"
