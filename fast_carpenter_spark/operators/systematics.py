"""SystematicWeights — weight-variation cross products.

Re-imagines fast-carpenter's SystematicWeights stage
(ref: fast_carpenter/define/systematics.py:61-94): given named weight
sources each with {nominal, up?, down?} column expressions, emit one
nominal product column (product of all nominals) and, per source and
direction, a variation column where that one factor is replaced.

Pure config-to-expression rewriting; every output is a single Catalyst
product expression (no shuffles, no UDFs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class SystematicWeightsStage:
    name: str
    weights: dict[str, dict]  # source -> {nominal: expr, up: expr, down: expr}
    out_prefix: str = "weight"
    extra_variations: list[tuple[str, dict]] = field(default_factory=list)

    def _product(self, factors: dict[str, str]) -> str:
        body = " * ".join(f"CAST({sql} AS DOUBLE)" for sql in factors.values())
        return f"({body})" if body else "CAST(1.0 AS DOUBLE)"

    def apply(self, df: DataFrame) -> DataFrame:
        nominals = {}
        for source, cfg in self.weights.items():
            if "nominal" not in cfg:
                raise ValueError(f"systematic {source!r}: missing 'nominal'")
            nominals[source] = cfg["nominal"]

        df = df.withColumn(
            f"{self.out_prefix}_nominal", F.expr(self._product(nominals))
        )
        for source, cfg in self.weights.items():
            for direction in ("up", "down"):
                if direction not in cfg:
                    continue
                varied = dict(nominals)
                varied[source] = cfg[direction]
                df = df.withColumn(
                    f"{self.out_prefix}_{source}_{direction}",
                    F.expr(self._product(varied)),
                )
        for vname, factors in self.extra_variations:
            df = df.withColumn(
                f"{self.out_prefix}_{vname}", F.expr(self._product(factors))
            )
        return df
