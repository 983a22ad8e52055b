"""The media decode capability seam (VERDICT r2 item 8).

No codec library ships in this container, so ``_probe_real_decoder``
returns None and the stub carries the pipeline — these tests prove the
SWAP path is real: a fake "real" decoder monkeypatched through the same
seam (module attribute read at plan-build time, captured in the
mapInPandas closure) reaches the executors and produces its output, with
zero changes to the Spark plumbing.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.functions import media
from fast_carpenter_spark import synth

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def flat(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    return spark.sql(synth.flat_spans_sql("spark")).limit(200)


def test_probe_returns_none_without_codec_libs():
    # this container has no PIL/ffmpeg — the probe must say so, not guess
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present; probe covered by swap test")
    except ImportError:
        pass
    assert media._probe_real_decoder() is None
    assert media.active_decoder() is media._stub_decode


def test_fake_real_decoder_reaches_executors(spark, flat, monkeypatch):
    # a fake codec-backed decoder through the SAME seam: constant sentinel
    # dims that the stub could never produce (stub width >= 16)
    def fake_decode(refs, kinds, payloads=None):
        n = len(refs)
        return pd.DataFrame(
            {
                "width": pd.Series([7] * n, dtype="int32"),
                "height": pd.Series([3] * n, dtype="int32"),
                "n_frames": pd.Series([1] * n, dtype="int32"),
            }
        )

    monkeypatch.setattr(media, "_REAL_DECODER", fake_decode)
    out = media.decode_media_spans(flat)
    got = out.agg(
        F.min("width"), F.max("width"), F.min("height"), F.max("height"),
        F.count(F.lit(1)),
    ).collect()[0]
    assert list(got)[:4] == [7, 7, 3, 3]
    assert got[4] > 0


def test_payload_column_is_passed_to_kernel(spark, flat, monkeypatch):
    # when a binary payload column exists, the kernel must receive it
    def fake_decode(refs, kinds, payloads=None):
        n = len(refs)
        w = 11 if payloads is not None else 5
        return pd.DataFrame(
            {
                "width": pd.Series([w] * n, dtype="int32"),
                "height": pd.Series([1] * n, dtype="int32"),
                "n_frames": pd.Series([1] * n, dtype="int32"),
            }
        )

    monkeypatch.setattr(media, "_REAL_DECODER", fake_decode)
    with_payload = flat.withColumn(
        "payload", F.encode(F.col("media_ref").cast("string"), "utf-8")
    )
    got = media.decode_media_spans(with_payload).agg(F.min("width")).collect()[0][0]
    assert got == 11, "payload column did not reach the decode kernel"


def test_stub_path_unchanged(spark, flat):
    # default path (no codec libs): stub output, deterministic
    out = media.decode_media_spans(flat)
    row = out.orderBy("doc_id", "span_idx").limit(1).collect()
    if row:
        assert row[0]["width"] >= 16
