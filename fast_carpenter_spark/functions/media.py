"""Multimodal span processing — media decode / feature-extract plumbing.

Media spans (kind in image/audio/table) are opaque references with typed
metadata.  The Spark-side plumbing is real and tested: schema, Arrow batch
shape, ``mapInPandas`` partitioned decode; the actual byte decode is a
clearly-marked STUB (no image/audio libs in this container) that emits a
deterministic fake derived from the media reference, so the pipeline is
fully verifiable end-to-end (and by the DuckDB oracle, which reproduces
the same arithmetic).

At scale this is the pattern for 100 TB media columns: binary payloads
stay columnar (parquet/Iceberg binary), decode happens inside Arrow
batches on executors, output is a typed struct — never driver-side, never
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _stub_decode(refs: pd.Series, kinds: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic fake metadata from the media reference.

    A real deployment replaces this body with (e.g.) PIL/ffmpeg over the
    binary column; the Spark plumbing around it is unchanged.  The fake is
    pure arithmetic on the numeric part of ``media://<n>`` so the DuckDB
    oracle can verify the full pipeline.
    """
    nums = refs.str.slice(8).astype("int64")  # strip "media://"
    width = (16 + nums % 1024).astype("int32")
    height = (16 + (nums * 7) % 1024).astype("int32")
    n_frames = pd.Series(
        pd.array(
            ((nums * 13) % 240 + 1).where(kinds == "audio", 1), dtype="int64"
        )
    ).astype("int32")
    return pd.DataFrame({"width": width, "height": height, "n_frames": n_frames})


def decode_media_spans(flat_spans: DataFrame) -> DataFrame:
    """Media-span metadata extraction via Arrow-batched mapInPandas."""
    media = flat_spans.filter("kind != 'text'").select(
        "doc_id", "span_idx", "kind", "media_ref"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _stub_decode(pdf["media_ref"], pdf["kind"])
            out = pdf[["doc_id", "span_idx", "kind", "media_ref"]].copy()
            out["width"] = meta["width"]
            out["height"] = meta["height"]
            out["n_frames"] = meta["n_frames"]
            yield out

    return media.mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_media_oracle_sql(flat_spans_sql: str) -> str:
    """Same arithmetic in SQL (the stub is deterministic by design)."""
    return f"""
SELECT doc_id, span_idx, kind, media_ref,
       CAST(16 + CAST(substr(media_ref, 9) AS BIGINT) % 1024 AS INT) AS width,
       CAST(16 + (CAST(substr(media_ref, 9) AS BIGINT) * 7) % 1024 AS INT) AS height,
       CAST(CASE WHEN kind = 'audio'
                 THEN (CAST(substr(media_ref, 9) AS BIGINT) * 13) % 240 + 1
                 ELSE 1 END AS INT) AS n_frames
FROM ({flat_spans_sql}) WHERE kind != 'text'
"""
