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


# Structural translation of the reference's demo processing config
# (ref: docs/demo_process_cfg.yml): reference LAYOUT verbatim — stage
# name -> dotted class path, per-stage config under the top-level stage-name
# key, string weights, reduce-in-selection, edges binning with out rename —
# with our table's columns standing in for the HEP branch names.
DEMO_PROCESSING = """
input: spans_nested
output_formats: [csv, json, pickle, dta, xlsx, msg]

stages:
    - span_cleaning: fast_carpenter.Define
    - event_selection: fast_carpenter.CutFlow
    - histogram: fast_carpenter.BinnedDataframe

span_cleaning:
    variables:
        - big_offsets: "offsets > 10"
        - n_big: {reduce: count_nonzero, formula: big_offsets}

event_selection:
    selection:
        All:
            - "n_spans > 1"
            - {reduce: -1, formula: "offsets > 10"}
            - Any:
                - "n_big >= 2"
                - "n_spans >= 3"
    weights: weight_nominal

histogram:
    binning:
        - {in: n_big}
        - {in: n_spans, out: nsp, bins: {edges: [0, 2, 4, 8]}}
    weights: weight_nominal
"""


@pytest.fixture(scope="module")
def demo_run(spark, docs, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_demo")
    mc = str(tmp / "mc.parquet")
    docs.write.mode("overwrite").parquet(mc)
    (tmp / "datasets.yml").write_text(
        DATASETS.format(mc=mc, data=mc).split("  - name: data_half")[0]
    )
    (tmp / "processing.yml").write_text(DEMO_PROCESSING)
    outdir = str(tmp / "out")
    proc = subprocess.run(
        [sys.executable, "-m", "fast_carpenter_spark",
         str(tmp / "datasets.yml"), str(tmp / "processing.yml"),
         "--outdir", outdir, "--master", "local[4]"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return outdir, proc


def test_demo_config_outputs(demo_run, spark):
    """Reference-layout config end-to-end: golden-check the binned table and
    cutflow totals against direct DataFrame computation (the analogue of the
    reference A/B harness, ref: benchmarks/compare_carpenter_versions/run.sh:60-83)."""
    from fast_carpenter_spark import synth

    outdir, _ = demo_run
    res = pd.read_csv(os.path.join(outdir, "result.csv"))
    assert {"n_big", "nsp", "n", "weight_nominal_sumw"} <= set(res.columns)
    # K2 extension-map sink: every configured format carries the same table
    jres = pd.read_json(os.path.join(outdir, "result.json"), lines=True)
    assert len(jres) == len(res) and jres["n"].sum() == res["n"].sum()
    pres = pd.read_pickle(os.path.join(outdir, "result.pkl"))
    assert len(pres) == len(res) and pres["n"].sum() == res["n"].sum()
    dres = pd.read_stata(os.path.join(outdir, "result.dta"))
    assert len(dres) == len(res) and dres["n"].sum() == res["n"].sum()
    from fast_carpenter_spark import minisinks
    mres = minisinks.read_msgpack(os.path.join(outdir, "result.msg"))
    assert len(mres) == len(res) and mres["n"].sum() == res["n"].sum()
    import zipfile
    with zipfile.ZipFile(os.path.join(outdir, "result.xlsx")) as zf:
        sheet_xml = zf.read("xl/worksheets/sheet1.xml").decode()
    # header row + one <row> per record in the xlsx worksheet
    assert sheet_xml.count("<row ") == len(res) + 1

    nested = spark.sql(
        "SELECT size(spans) AS n_spans, "
        "size(filter(spans, s -> s.offset > 10)) AS n_big, "
        "element_at(spans, -1).offset AS last_offset, "
        "CAST(1.0 + size(spans) / 16.0 AS DOUBLE) AS w "
        f"FROM ({synth.spans_table_sql('spark')})"
    )
    surviving = nested.filter(
        "n_spans > 1 AND last_offset > 10 AND (n_big >= 2 OR n_spans >= 3)"
    )
    assert res["n"].sum() == surviving.count()
    import pytest as _pt
    assert res["weight_nominal_sumw"].sum() == _pt.approx(
        surviving.selectExpr("sum(w)").collect()[0][0], rel=1e-12
    )

    ctr = pd.read_csv(os.path.join(outdir, "cutflow.csv"))
    deepest = ctr[(ctr.count_type == "passed_incl")
                  & (ctr.weight_name == "unweighted")]
    # the All-combinator root's passed count equals the surviving rows
    root = ctr[(ctr.depth == 0) & (ctr.count_type == "passed_incl")
               & (ctr.weight_name == "unweighted")]
    assert root["value"].sum() == surviving.count()
    assert (ctr.weight_name == "weight_nominal").any()


def test_buildaghast_rejected():
    from fast_carpenter_spark.plans.pipeline import Pipeline

    with pytest.raises(ValueError, match="BuildAghast"):
        Pipeline.from_config(
            {"stages": [{"agh": "fast_carpenter.BuildAghast"}], "agh": {}}
        )
