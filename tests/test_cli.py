"""End-to-end CLI: ``python -m fast_carpenter_spark datasets.yml
processing.yml --outdir`` — the reference's top-level UX (ref:
fast_carpenter/__main__.py:66-84) over two datasets (mc + data)."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASETS = """
datasets:
  - name: mc_half
    eventtype: mc
    files: ["{mc}"]
  - name: data_half
    eventtype: data
    files: ["{data}"]
"""

PROCESSING = """
stages:
  - define:
      variables:
        - r2: "lon**2 + lat**2"
  - cutflow:
      selection:
        All:
          - "n_chars > 100"
      weights: {w: w}
  - binned_dataframe:
      binning:
        - in: kind
      weights: {w: w}
      dataset_col: dataset
"""


@pytest.fixture(scope="module")
def cli_run(spark, docs, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    mc = str(tmp / "mc.parquet")
    data = str(tmp / "data.parquet")
    docs.filter("doc_id % 2 = 0").write.mode("overwrite").parquet(mc)
    docs.filter("doc_id % 2 = 1").write.mode("overwrite").parquet(data)
    (tmp / "datasets.yml").write_text(DATASETS.format(mc=mc, data=data))
    (tmp / "processing.yml").write_text(PROCESSING)
    outdir = str(tmp / "out")
    proc = subprocess.run(
        [sys.executable, "-m", "fast_carpenter_spark",
         str(tmp / "datasets.yml"), str(tmp / "processing.yml"),
         "--outdir", outdir, "--master", "local[4]"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return outdir, proc


def test_cli_outputs(cli_run):
    outdir, proc = cli_run
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] > 0 and summary["cutflow_rows"] > 0
    for f in ("result.parquet", "result.csv", "cutflow.csv", "manifest.json"):
        assert os.path.exists(os.path.join(outdir, f))


def test_cli_mc_data_weighting(cli_run):
    """The mc dataset carries real weighted sums; the data dataset's
    weighted columns equal its unweighted counts (ref: filters.py:48)."""
    outdir, _ = cli_run
    res = pd.read_csv(os.path.join(outdir, "result.csv"))
    mc = res[res.dataset == "mc_half"]
    dt = res[res.dataset == "data_half"]
    assert (dt["w_sumw"] == dt["n"].astype(float)).all()
    assert (mc["w_sumw"] != mc["n"].astype(float)).any()

    ctr = pd.read_csv(os.path.join(outdir, "cutflow.csv"))
    d = ctr[(ctr.dataset == "data_half") & (ctr.count_type == "passed_incl")]
    per_w = d.groupby("weight_name")["value"].sum()
    assert per_w["w"] == per_w["unweighted"]


def test_cli_cutflow_values(cli_run, spark, docs):
    """Cutflow totals equal direct counts over the surviving spans."""
    from fast_carpenter_spark import synth

    outdir, _ = cli_run
    ctr = pd.read_csv(os.path.join(outdir, "cutflow.csv"))
    spans = spark.sql(synth.flat_spans_sql("spark"))
    mc_total = spans.filter("doc_id % 2 = 0").count()
    row = ctr[(ctr.dataset == "mc_half") & (ctr.count_type == "totals_incl")
              & (ctr.weight_name == "unweighted")]
    assert row["value"].iloc[0] == mc_total
