"""EventByEventDataframe — event-level skims.

Re-imagines fast-carpenter's EventByEventDataframe
(ref: fast_carpenter/summary/event_level_dataframe.py:45-87): select a set
of collections, optionally flatten jagged ones (posexplode), optionally
apply a mask expression first, and hand the result to a parquet sink —
Spark's write replaces the reference's per-chunk pandas concat + HDF sink.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..expressions import compile_expression
from .binned import explode_jagged


@dataclass
class EventByEventDataframeStage:
    name: str
    collections: list[str]
    mask: str | None = None
    flatten: bool = True

    def apply(self, df: DataFrame) -> DataFrame:
        if self.mask:
            df = df.filter(F.expr(compile_expression(self.mask, valid=set(df.columns))))
        out = df.select(*self.collections)
        if self.flatten:
            out = explode_jagged(out, self.collections)
        return out

    def write(self, df: DataFrame, path: str) -> None:
        self.apply(df).write.mode("overwrite").parquet(path)
