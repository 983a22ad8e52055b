"""Layout A/B semantics: file assignments recomputed in numpy, and the
design claim itself (Hilbert touches no more files than Morton on
average) asserted on the real corpus."""

import numpy as np

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.spatial.layout import (
    LAYOUT_FILES,
    LAYOUT_QUAD_RES,
    LAYOUT_RES,
    layout_compare_sql,
)


def _morton(x, y):
    def spread(v):
        out = np.zeros_like(v)
        for b in range(LAYOUT_RES):
            out |= (v & (1 << b)) << b
        return out

    return spread(x) + 2 * spread(y)


def test_layout_compare_matches_numpy(spark, docs):
    out = spark.sql(
        layout_compare_sql(synth.flat_spans_sql("spark"), "spark")
    ).toPandas()
    cells = spark.sql(
        f"SELECT DISTINCT {grid.cell_sql('lon', 'lat', LAYOUT_RES, 'spark')} AS c"
        f" FROM ({synth.flat_spans_sql('spark')})"
    ).toPandas()
    _, x, y = grid.unpack_cells(cells["c"].to_numpy())
    n_occ = len(x)
    hk = grid.hilbert_key(x, y, LAYOUT_RES)
    mk = _morton(x.astype(np.int64), y.astype(np.int64))
    file_h = (np.argsort(np.argsort(hk)) * LAYOUT_FILES) // n_occ
    file_m = (np.argsort(np.argsort(mk)) * LAYOUT_FILES) // n_occ
    shift = LAYOUT_RES - LAYOUT_QUAD_RES
    expected = {}
    for qx in range(1 << LAYOUT_QUAD_RES):
        for qy in range(1 << LAYOUT_QUAD_RES):
            sel = (x >> shift == qx) & (y >> shift == qy)
            if sel.any():
                expected[(qx, qy)] = (
                    int(sel.sum()),
                    len(np.unique(file_h[sel])),
                    len(np.unique(file_m[sel])),
                )
    got = {
        (int(r.qx), int(r.qy)): (int(r.n_cells), int(r.files_hilbert), int(r.files_morton))
        for r in out.itertuples()
    }
    assert got == expected


def test_hilbert_no_worse_than_morton(spark, docs):
    out = spark.sql(
        layout_compare_sql(synth.flat_spans_sql("spark"), "spark")
    ).toPandas()
    # the design claim: summed over window queries, Hilbert range-files
    # opened <= Morton range-files opened
    assert out.files_hilbert.sum() <= out.files_morton.sum()
