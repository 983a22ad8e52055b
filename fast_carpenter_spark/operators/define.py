"""Define stage — expression-derived columns, scalar or jagged, with
optional per-row array reduction.

Re-imagines fast-carpenter's Define stage
(ref: fast_carpenter/define/variables.py:15-76 simple exprs;
:117-149 CalculationCfg with reduce/mask/fill_missing) on Spark:

* scalar expressions compile straight to Catalyst expressions
  (``withColumn(name, expr(sql))``) — whole-stage codegen, no Python;
* expressions over jagged (ArrayType) columns become higher-order
  ``transform`` lambdas, with scalar columns broadcast into the lambda
  (the reference's jagged/scalar broadcast,
  ref: fast_carpenter/expressions.py:65-128);
* ``mask`` filters array elements before reduction
  (ref: define/variables.py:142-147 ``result = result[mask]``);
* ``reduce`` collapses one nesting level via the R1-R9 reduction set
  (ref: fast_carpenter/define/reductions.py:14-58 and
  tree_adapter.py:335-448), expressed as array built-ins.

Overwriting an existing column raises, matching the reference's
``new_variable`` contract (ref: tree_adapter.py:93-103).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F, types as T

from ..expressions import ExpressionError, compile_expression, get_branches

_REDUCE_METHODS = {
    "sum", "prod", "any", "all", "count_nonzero", "max", "min",
    "argmax", "argmin", "counts",
}


def reduction_sql(method, arr: str, fill_missing=None) -> str:
    """Compile one jagged reduction over array expression ``arr``.

    ``method`` is an int (Nth element, 0-based; negative = from the end,
    ref JaggedNth define/reductions.py:14-32) or one of
    sum/prod/any/all/count_nonzero/max/min/argmax/argmin/counts
    (ref: define/reductions.py:35-58, tree_adapter.py:335-448).
    """
    if isinstance(method, bool):
        raise ValueError("reduce must be an int or a method name")
    if isinstance(method, int):
        # Spark element_at is 1-based; negative indices count from the end.
        idx = method + 1 if method >= 0 else method
        out = f"try_element_at({arr}, {idx})"
        if fill_missing is not None:
            out = f"coalesce({out}, {fill_missing!r})"
        return out
    method = str(method)
    if method == "sum":
        return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    if method == "prod":
        return f"aggregate({arr}, CAST(1.0 AS DOUBLE), (acc, x) -> acc * CAST(x AS DOUBLE))"
    if method == "any":
        return f"exists({arr}, x -> CAST(x AS BOOLEAN))"
    if method == "all":
        return f"forall({arr}, x -> CAST(x AS BOOLEAN))"
    if method == "count_nonzero":
        return f"size(filter({arr}, x -> CAST(x AS DOUBLE) != 0.0))"
    if method == "max":
        return f"array_max({arr})"
    if method == "min":
        return f"array_min({arr})"
    if method == "argmax":
        return f"(array_position({arr}, array_max({arr})) - 1)"
    if method == "argmin":
        return f"(array_position({arr}, array_min({arr})) - 1)"
    if method == "counts":
        return f"size({arr})"
    raise ValueError(f"unknown reduction {method!r}")


@dataclass
class Variable:
    """One derived column (ref CalculationCfg: define/variables.py:117-139)."""

    name: str
    formula: str
    reduce: object | None = None
    mask: str | None = None
    fill_missing: object | None = None

    @classmethod
    def from_config(cls, name: str, cfg) -> "Variable":
        if isinstance(cfg, str):
            return cls(name=name, formula=cfg)
        if isinstance(cfg, dict):
            unknown = set(cfg) - {"formula", "reduce", "mask", "fill_missing"}
            if unknown:
                raise ValueError(f"variable {name!r}: unknown config keys {sorted(unknown)}")
            if "formula" not in cfg:
                raise ValueError(f"variable {name!r}: missing 'formula'")
            return cls(name=name, **cfg)
        raise ValueError(f"variable {name!r}: config must be str or dict")


def _array_cols(df: DataFrame, names: list[str]) -> list[str]:
    fields = {f.name: f.dataType for f in df.schema.fields}
    return [n for n in names if isinstance(fields.get(n), T.ArrayType)]


def _array_depth(dt) -> int:
    """Nesting depth of an ArrayType (array<double> -> 1, array<array<..>> -> 2)."""
    d = 0
    while isinstance(dt, T.ArrayType):
        d += 1
        dt = dt.elementType
    return d


def compile_variable(df: DataFrame, var: Variable) -> str:
    """Compile one Variable against ``df``'s schema into a SQL fragment."""
    valid = set(df.columns)
    branches = get_branches(var.formula, valid | set())
    missing = [b for b in branches if b not in valid]
    if missing:
        raise ExpressionError(f"variable {var.name!r}: unknown columns {missing}")
    arrays = _array_cols(df, branches)

    if not arrays:
        sql = compile_expression(var.formula, valid=valid)
        if var.mask is not None or var.reduce is not None:
            raise ExpressionError(
                f"variable {var.name!r}: mask/reduce require a jagged input"
            )
        return sql

    # Jagged path: lambda over the first array, index-aligned access to the
    # rest (equal jaggedness is the caller's invariant, as in the reference's
    # explode guard — ref: summary/binned_dataframe.py:310).
    fields = {f.name: f.dataType for f in df.schema.fields}
    lead = arrays[0]
    depth = _array_depth(fields[lead])
    if depth > 1 and len(arrays) > 1:
        # mirrors the reference's broadcast failure on mismatched 3D
        # jaggedness (ref: tests/test_expressions.py:93-97 "cannot broadcast")
        raise ExpressionError(
            f"variable {var.name!r}: cannot broadcast distinct nested jagged "
            f"arrays ({arrays})"
        )
    subs = {lead: "_x"}
    for other in arrays[1:]:
        subs[other] = f"try_element_at({other}, _i + 1)"
    body = compile_expression(var.formula, subs=subs, valid=valid)

    # innermost level: elementwise transform (+ optional element mask), as
    # in awkward's axis=-1 broadcasting the reference relies on for 3D
    # (ref: tests/test_expressions.py:63-91 Fake3D * 2, .count())
    if var.mask is not None:
        mask_branches = get_branches(var.mask, valid)
        mask_arrays = _array_cols(df, mask_branches)
        msubs = dict(subs) if mask_arrays else {}
        mask_body = compile_expression(var.mask, subs=msubs, valid=valid)
        zipped = (
            "transform(__SRC__, (_x, _i) -> struct("
            f"{body} AS v, {mask_body} AS m))"
        )
        inner = f"transform(filter({zipped}, _s -> _s.m), _s -> _s.v)"
    else:
        inner = f"transform(__SRC__, (_x, _i) -> {body})"
    # reduce collapses the innermost level only (awkward axis=-1 default):
    # depth-2 input + reduce -> depth-1 output
    if var.reduce is not None:
        inner = reduction_sql(var.reduce, inner, var.fill_missing)

    def wrap(src: str, d: int) -> str:
        if d == 1:
            return inner.replace("__SRC__", src)
        return f"transform({src}, _o{d} -> {wrap(f'_o{d}', d - 1)})"

    return wrap(lead, depth)


@dataclass
class DefineStage:
    """Ordered list of derived columns; later variables see earlier ones
    (the mutable "data-space" contract, ref: docs/glossary.rst)."""

    name: str = "define"
    variables: list[Variable] = field(default_factory=list)

    @classmethod
    def from_config(cls, name: str, variables: list[dict]) -> "DefineStage":
        out = []
        for item in variables:
            if len(item) != 1:
                raise ValueError("each variable must be a single {name: config} mapping")
            ((vname, cfg),) = item.items()
            out.append(Variable.from_config(vname, cfg))
        return cls(name=name, variables=out)

    def apply(self, df: DataFrame) -> DataFrame:
        for var in self.variables:
            if var.name in df.columns:
                raise ValueError(
                    f"variable {var.name!r} already exists — overwrite forbidden "
                    "(ref: tree_adapter.py:93-103)"
                )
            df = df.withColumn(var.name, F.expr(compile_variable(df, var)))
        return df
