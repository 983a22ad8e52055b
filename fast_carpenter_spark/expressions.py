"""numexpr-dialect -> Spark SQL transpiler.

fast-carpenter evaluates user expression strings with numexpr over the
chunk's columns (ref: fast_carpenter/expressions.py:146-148), supporting
arithmetic, `**`, comparisons, `&`/`|` masks, `where(cond, a, b)`, the
constants nan/inf/pi/e (ref: expressions.py:18-22), and dotted names
rewritten `a.b` -> `a__DOT__b` (ref: expressions.py:131-143).

Here the same dialect is parsed with Python's ``ast`` (numexpr syntax is a
Python-expression subset) and emitted as a Spark SQL scalar expression, so
the whole thing stays inside Catalyst/Tungsten codegen — the Spark-native
replacement for numexpr's fused SIMD loops.

Jagged (array-typed) inputs are handled by the caller (operators.define):
the compiled body is wrapped in ``transform(...)`` lambdas; this module just
rewrites column references through a substitution map.
"""

from __future__ import annotations

import ast

CONSTANTS = {
    "nan": "CAST('NaN' AS DOUBLE)",
    "inf": "CAST('Infinity' AS DOUBLE)",
    "pi": "PI()",
    "e": "E()",
    "True": "TRUE",
    "False": "FALSE",
}

# numexpr/numpy function name -> SQL function name (1:1 arity)
FUNCTIONS = {
    "sqrt": "SQRT",
    "abs": "ABS",
    "exp": "EXP",
    "log": "LN",
    "log10": "LOG10",
    "log1p": "LOG1P",
    "sin": "SIN",
    "cos": "COS",
    "tan": "TAN",
    "arcsin": "ASIN",
    "arccos": "ACOS",
    "arctan": "ATAN",
    "sinh": "SINH",
    "cosh": "COSH",
    "tanh": "TANH",
    "floor": "FLOOR",
    "ceil": "CEIL",
    "expm1": "EXPM1",
    "arctan2": "ATAN2",  # two-arg: numexpr arctan2(y, x)
}

BINOPS = {
    ast.Add: "+",
    ast.Sub: "-",
    ast.Mult: "*",
    ast.Div: "/",
    ast.Mod: "%",
}

CMPOPS = {
    ast.Gt: ">",
    ast.GtE: ">=",
    ast.Lt: "<",
    ast.LtE: "<=",
    ast.Eq: "=",
    ast.NotEq: "!=",
}


class ExpressionError(ValueError):
    pass


def get_branches(expression: str, valid: set[str] | None = None) -> list[str]:
    """Column names referenced by an expression, in first-use order
    (ref: fast_carpenter/expressions.py:25-41 get_branches)."""
    tree = ast.parse(expression, mode="eval")
    seen: list[str] = []

    def visit(node: ast.AST) -> None:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            for arg in node.args:
                visit(arg)
            return
        if isinstance(node, ast.Name):
            name = node.id
            if name not in CONSTANTS and name not in FUNCTIONS and name not in seen:
                if valid is None or name in valid:
                    seen.append(name)
        elif isinstance(node, ast.Attribute):
            name = _attr_name(node)
            if name not in seen and (valid is None or name in valid):
                seen.append(name)
            return  # don't descend into the attribute chain
        for child in ast.iter_child_nodes(node):
            visit(child)

    visit(tree)
    return seen


def _attr_name(node: ast.Attribute) -> str:
    parts = []
    cur: ast.AST = node
    while isinstance(cur, ast.Attribute):
        parts.append(cur.attr)
        cur = cur.value
    if not isinstance(cur, ast.Name):
        raise ExpressionError("unsupported attribute base in expression")
    parts.append(cur.id)
    return ".".join(reversed(parts))


def preprocess_name(name: str) -> str:
    """`a.b.c` -> `a__DOT__b__DOT__c` (ref: expressions.py:131-143)."""
    return name.replace(".", "__DOT__")


def compile_expression(
    expression: str,
    subs: dict[str, str] | None = None,
    valid: set[str] | None = None,
) -> str:
    """Compile a numexpr-dialect string to a Spark SQL scalar expression.

    ``subs`` maps column names to replacement SQL fragments (used by the
    jagged/`transform` path to point names at lambda variables).  ``valid``,
    when given, restricts bare names to known columns — unknown names raise,
    mirroring the reference's eager config validation.
    """
    subs = subs or {}
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise ExpressionError(f"cannot parse expression {expression!r}: {exc}") from exc
    return _emit(tree.body, subs, valid)


def _name_sql(name: str, subs: dict[str, str], valid: set[str] | None) -> str:
    if name in subs:
        return subs[name]
    if name in CONSTANTS:
        return CONSTANTS[name]
    if valid is not None and name not in valid:
        raise ExpressionError(f"unknown column {name!r} in expression")
    safe = preprocess_name(name)
    return f"`{safe}`" if not safe.isidentifier() else safe


def _emit(node: ast.AST, subs: dict[str, str], valid: set[str] | None) -> str:
    if isinstance(node, ast.Constant):
        if isinstance(node.value, bool):
            return "TRUE" if node.value else "FALSE"
        if isinstance(node.value, (int, float)):
            return repr(node.value)
        if isinstance(node.value, str):
            escaped = node.value.replace("'", "''")
            return f"'{escaped}'"
        raise ExpressionError(f"unsupported literal {node.value!r}")

    if isinstance(node, ast.Name):
        return _name_sql(node.id, subs, valid)

    if isinstance(node, ast.Attribute):
        return _name_sql(_attr_name(node), subs, valid)

    if isinstance(node, ast.UnaryOp):
        operand = _emit(node.operand, subs, valid)
        if isinstance(node.op, ast.USub):
            return f"(- {operand})"
        if isinstance(node.op, ast.UAdd):
            return operand
        if isinstance(node.op, (ast.Invert, ast.Not)):
            return f"(NOT {operand})"
        raise ExpressionError("unsupported unary operator")

    if isinstance(node, ast.BinOp):
        left = _emit(node.left, subs, valid)
        right = _emit(node.right, subs, valid)
        if isinstance(node.op, ast.Pow):
            # small integer exponents compile to multiplication: exact IEEE
            # parity across engines (POWER/pow is not correctly rounded and
            # differs by ulps between libm implementations)
            if isinstance(node.right, ast.Constant) and node.right.value in (2, 3):
                reps = [f"({left})"] * int(node.right.value)
                return "(" + " * ".join(reps) + ")"
            return f"POWER({left}, {right})"
        if isinstance(node.op, ast.BitAnd):
            return f"(({left}) AND ({right}))"
        if isinstance(node.op, ast.BitOr):
            return f"(({left}) OR ({right}))"
        if isinstance(node.op, ast.BitXor):
            return f"(({left}) != ({right}))"
        op = BINOPS.get(type(node.op))
        if op is None:
            raise ExpressionError(f"unsupported operator {type(node.op).__name__}")
        return f"(({left}) {op} ({right}))"

    if isinstance(node, ast.BoolOp):
        op = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + op.join(f"({_emit(v, subs, valid)})" for v in node.values) + ")"

    if isinstance(node, ast.Compare):
        left = _emit(node.left, subs, valid)
        parts = []
        for op, comparator in zip(node.ops, node.comparators):
            sql_op = CMPOPS.get(type(op))
            if sql_op is None:
                raise ExpressionError(f"unsupported comparison {type(op).__name__}")
            right = _emit(comparator, subs, valid)
            parts.append(f"(({left}) {sql_op} ({right}))")
            left = right
        return "(" + " AND ".join(parts) + ")" if len(parts) > 1 else parts[0]

    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name):
            raise ExpressionError("only simple function calls supported")
        fname = node.func.id
        args = [_emit(a, subs, valid) for a in node.args]
        if fname == "where":
            if len(args) != 3:
                raise ExpressionError("where(cond, a, b) takes 3 arguments")
            return f"(CASE WHEN {args[0]} THEN {args[1]} ELSE {args[2]} END)"
        if fname == "hypot":
            if len(args) != 2:
                raise ExpressionError("hypot(a, b) takes 2 arguments")
            return f"SQRT(POWER({args[0]}, 2) + POWER({args[1]}, 2))"
        if fname == "minimum":
            return f"LEAST({', '.join(args)})"
        if fname == "maximum":
            return f"GREATEST({', '.join(args)})"
        sql_fn = FUNCTIONS.get(fname)
        if sql_fn is None:
            raise ExpressionError(f"unsupported function {fname!r}")
        return f"{sql_fn}({', '.join(args)})"

    raise ExpressionError(f"unsupported syntax node {type(node).__name__}")
