"""Property tests for the stdlib msgpack/xlsx sinks (hypothesis).

The parametrized golden vectors in test_minisinks.py pin the exact spec
bytes at every format-family boundary; these properties cover the space
BETWEEN the boundaries — arbitrary nested structures must survive
pack->unpack, and arbitrary numeric/string frames must survive the xlsx
write->parse round trip with exact double recovery.
"""

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from fast_carpenter_spark import minisinks

# scalars msgpack can represent exactly: None, bool, int64-range ints,
# finite-or-special float64, unicode text, bytes
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 63), max_value=2 ** 64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=80),
    st.binary(max_size=40),
)
_nested = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(max_size=12), children, max_size=6),
    ),
    max_leaves=40,
)


@settings(max_examples=200, deadline=None)
@given(_nested)
def test_msgpack_roundtrip_property(obj):
    back = minisinks.unpackb(minisinks.packb(obj))
    # tuples come back as lists (msgpack has one array type)
    def norm(x):
        if isinstance(x, tuple):
            return [norm(v) for v in x]
        if isinstance(x, list):
            return [norm(v) for v in x]
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        return x
    assert back == norm(obj)


@settings(max_examples=150, deadline=None)
@given(st.floats(allow_nan=True, allow_infinity=True))
def test_msgpack_float64_exact(x):
    raw = minisinks.packb(x)
    back = minisinks.unpackb(raw)
    if math.isnan(x):
        assert math.isnan(back)
    else:
        assert back == x and math.copysign(1, back) == math.copysign(1, x)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False), min_size=1, max_size=12),
    st.lists(st.integers(min_value=-(2 ** 53), max_value=2 ** 53), min_size=1, max_size=12),
    st.lists(st.text(max_size=30), min_size=1, max_size=12),
)
def test_xlsx_roundtrip_property(floats, ints, texts):
    import tempfile, os
    n = min(len(floats), len(ints), len(texts))
    pdf = pd.DataFrame(
        {"f": floats[:n], "i": np.array(ints[:n], dtype=np.int64), "s": texts[:n]}
    )
    from tests.test_minisinks import _parse_sheet
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "p.xlsx")
        minisinks.write_xlsx(pdf, path)
        cells = _parse_sheet(path)
    for r in range(n):
        assert cells[f"A{r + 2}"] == floats[r]  # exact double via repr
        assert cells[f"B{r + 2}"] == float(ints[r])
        got = cells.get(f"C{r + 2}", "")
        # ElementTree returns '' for empty inline strings
        assert (got or "") == texts[r]
