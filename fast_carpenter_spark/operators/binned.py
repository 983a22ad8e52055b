"""BinnedDataframe — N-dimensional binned summary tables (and, with cell
ids as the binned dimension, the engine's per-tile aggregator).

Re-imagines fast-carpenter's BinnedDataframe stage
(ref: fast_carpenter/summary/binned_dataframe.py:117-281) on Spark:

* binning spec per dimension: uniform {nbins, low, high} or explicit
  {edges: [...]}, left-closed, with +-inf under/overflow buckets
  (ref: summary/binning_config.py:63-81 bin_one_dimension) — or
  categorical pass-through (no ``bins``);
* bin index = `size(filter(edges, e -> e <= x)) - 1` over a literal edge
  array — pure Catalyst, codegen'd, identical formula in the DuckDB oracle;
* aggregation = groupBy(bins).agg(count, sum(w), sum(w*w)) — Spark's
  partial/final hash agg replaces the reference's per-chunk pandas
  partials + `DataFrame.add` merge (ref: binned_dataframe.py:225-238);
* jagged inputs are exploded first, with the equal-jaggedness guard
  (ref: binned_dataframe.py:287-320);
* ``pad_missing`` densifies to the full cartesian product of bins via a
  cross-join of tiny edge tables + left join
  (ref: binned_dataframe.py:103-114 densify_dataframe);
* optional ``dataset_col`` adds the dataset dimension
  (ref: binned_dataframe.py:54-100).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

NEG_INF = float("-inf")
POS_INF = float("inf")


@dataclass
class Dimension:
    in_col: str
    out_col: str
    edges: list[float] | None = None  # None -> categorical pass-through

    @classmethod
    def from_config(cls, cfg: dict) -> "Dimension":
        in_col = cfg["in"]
        out_col = cfg.get("out", in_col)
        bins = cfg.get("bins")
        if bins is None:
            return cls(in_col, out_col, None)
        if "edges" in bins:
            edges = [float(e) for e in bins["edges"]]
        else:
            nbins, low, high = int(bins["nbins"]), float(bins["low"]), float(bins["high"])
            edges = list(np.linspace(low, high, nbins + 1))
        if bins.get("underflow", True):
            edges = [NEG_INF] + edges
        if bins.get("overflow", True):
            edges = edges + [POS_INF]
        return cls(in_col, out_col, edges)

    def _edge_array_sql(self, dialect: str) -> str:
        def lit(e: float) -> str:
            if e == NEG_INF:
                return "CAST('-Infinity' AS DOUBLE)"
            if e == POS_INF:
                return "CAST('Infinity' AS DOUBLE)"
            # both engines parse bare fractional literals as DECIMAL — force
            # a correctly-rounded string->double parse instead
            return f"CAST('{e!r}' AS DOUBLE)"

        body = ", ".join(lit(e) for e in self.edges)
        return f"array({body})" if dialect == "spark" else f"[{body}]"

    def index_sql(self, dialect: str) -> str:
        """Left-closed bin index of ``in_col`` (0-based into edges);
        NULL input -> NULL (dropped by the groupBy like pandas cut->NaN)."""
        arr = self._edge_array_sql(dialect)
        x = f"CAST({self.in_col} AS DOUBLE)"
        if dialect == "spark":
            filt = f"size(filter({arr}, e -> e <= {x}))"
        else:
            filt = f"len(list_filter({arr}, e -> e <= {x}))"
        return f"(CASE WHEN {x} IS NULL THEN NULL ELSE {filt} - 1 END)"

    def lo_hi_sql(self, idx_expr: str, dialect: str) -> tuple[str, str]:
        arr = self._edge_array_sql(dialect)
        if dialect == "spark":
            lo = f"try_element_at({arr}, CAST({idx_expr} AS INT) + 1)"
            hi = f"try_element_at({arr}, CAST({idx_expr} AS INT) + 2)"
        else:
            lo = f"list_extract({arr}, CAST({idx_expr} AS INT) + 1)"
            hi = f"list_extract({arr}, CAST({idx_expr} AS INT) + 2)"
        return lo, hi


def explode_jagged(df: DataFrame, cols: list[str]) -> DataFrame:
    """Explode the jagged subset of ``cols`` into one row per element,
    enforcing equal jaggedness (ref: binned_dataframe.py:287-320)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    jagged = [c for c in cols if isinstance(fields.get(c), T.ArrayType)]
    if not jagged:
        return df
    lead = jagged[0]
    for other in jagged[1:]:
        guard = F.expr(
            f"CASE WHEN size({lead}) = size({other}) THEN TRUE "
            f"ELSE raise_error('explode: different jaggedness between "
            f"{lead} and {other}') END"
        )
        df = df.filter(guard)
    pos = F.posexplode(F.col(lead)).alias("_pos", f"_{lead}")
    keep = [c for c in df.columns if c not in jagged]
    df = df.select(*keep, *[F.col(c) for c in jagged], pos)
    for other in jagged[1:]:
        df = df.withColumn(f"_{other}", F.expr(f"try_element_at({other}, _pos + 1)"))
    rename = {c: f"_{c}" for c in jagged}
    out = df.select(
        *[F.col(c) for c in keep],
        *[F.col(rename[c]).alias(c) for c in jagged],
    )
    return out


@dataclass
class BinnedDataframeStage:
    """groupBy(bins) -> n, sumw, sumw2 per weight
    (ref: binned_dataframe.py:250-281 _bin_values)."""

    name: str
    binning: list[dict]
    weights: dict[str, str] = field(default_factory=dict)
    dataset_col: str | None = None
    pad_missing: bool = False
    # weights apply to MC datasets only unless weight_data=True; data
    # datasets fill sumw with unweighted counts (ref:
    # binned_dataframe.py:178,192,208 weight_data / eventtype == "mc")
    eventtype: str = "mc"
    weight_data: bool = False

    def __post_init__(self):
        self.dimensions = [Dimension.from_config(b) for b in self.binning]

    def apply(self, df: DataFrame) -> DataFrame:
        in_cols = [d.in_col for d in self.dimensions]
        df = explode_jagged(df, in_cols)

        group_cols = []
        if self.dataset_col:
            group_cols.append(self.dataset_col)
        for dim in self.dimensions:
            if dim.edges is None:
                if dim.out_col != dim.in_col:
                    df = df.withColumn(dim.out_col, F.col(dim.in_col))
                group_cols.append(dim.out_col)
            else:
                df = df.withColumn(dim.out_col, F.expr(dim.index_sql("spark")))
                group_cols.append(dim.out_col)

        aggs = [F.count(F.lit(1)).alias("n")]
        use_weights = self.eventtype == "mc" or self.weight_data
        for wname, wsql in self.weights.items():
            w = f"CAST({wsql} AS DOUBLE)" if use_weights else "CAST(1.0 AS DOUBLE)"
            aggs.append(F.expr(f"sum({w})").alias(f"{wname}_sumw"))
            aggs.append(F.expr(f"sum({w} * {w})").alias(f"{wname}_sumw2"))
        out = df.groupBy(*group_cols).agg(*aggs)

        if self.pad_missing:
            out = self._densify(df.sparkSession, out, group_cols)

        # attach bin bounds for binned dimensions (interval labels analogue)
        for dim in self.dimensions:
            if dim.edges is not None:
                lo, hi = dim.lo_hi_sql(dim.out_col, "spark")
                out = out.withColumn(f"{dim.out_col}_lo", F.expr(lo))
                out = out.withColumn(f"{dim.out_col}_hi", F.expr(hi))
        return out

    def _densify(self, spark, out: DataFrame, group_cols: list[str]) -> DataFrame:
        """Full cartesian product of bin indices, left-joined with observed
        counts; missing bins get n=0 (ref: binned_dataframe.py:103-114)."""
        full = None
        for dim in self.dimensions:
            if dim.edges is None:
                sub = out.select(dim.out_col).distinct()
            else:
                n_idx = len(dim.edges) - 1
                sub = spark.range(n_idx).select(
                    F.col("id").cast("int").alias(dim.out_col)
                )
            full = sub if full is None else full.crossJoin(sub)
        if self.dataset_col:
            ds = out.select(self.dataset_col).distinct()
            full = ds.crossJoin(full)
        joined = full.join(out, on=group_cols, how="left")
        fills = {"n": 0}
        joined = joined.na.fill(fills)
        for wname in self.weights:
            joined = joined.withColumn(
                f"{wname}_sumw", F.coalesce(f"{wname}_sumw", F.lit(0.0))
            ).withColumn(
                f"{wname}_sumw2", F.coalesce(f"{wname}_sumw2", F.lit(0.0))
            )
        return joined
