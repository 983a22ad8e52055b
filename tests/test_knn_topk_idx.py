"""Property tests for the exact argpartition top-k fast path.

``_topk_row_idx(d2, kk)`` must be bit-identical to
``np.argsort(d2, axis=1, kind="stable")[:, :kk]`` — same indices, same
(value, column) tie order — on every distance-block regime the kNN
kernels produce: random spreads, degenerate point masses (whole-row tie
classes), blob+halo mixes, few-distinct-value ties, and rows of mixed
classes inside one chunk.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fast_carpenter_spark.spatial.knn import _topk_row_idx


def _ref(d2: np.ndarray, kk: int) -> np.ndarray:
    return np.argsort(d2, axis=1, kind="stable")[:, :kk]


@pytest.mark.parametrize("kk", [1, 2, 4, 7])
@pytest.mark.parametrize(
    "name",
    ["random", "all_tie", "blob_halo", "few_values", "mixed_rows", "tiny"],
)
def test_topk_idx_regimes(name: str, kk: int) -> None:
    rng = np.random.default_rng(20260820 + kk)
    if name == "random":
        d2 = rng.random((37, 900))
    elif name == "all_tie":
        d2 = np.zeros((11, 500))
    elif name == "blob_halo":
        d2 = np.zeros((23, 800))
        d2[:, 600:] = rng.random((23, 200)) + 0.5
    elif name == "few_values":
        d2 = rng.integers(0, 3, (29, 700)).astype(float)
    elif name == "mixed_rows":
        d2 = rng.random((30, 650))
        d2[::3] = 0.0  # every third row is a full-row tie class
    else:  # tiny: below the n<=64 sort fallback AND just above it
        d2 = rng.integers(0, 2, (5, 66)).astype(float)
    got = _topk_row_idx(d2.copy(), kk)
    assert np.array_equal(got, _ref(d2, kk)), name


def test_topk_idx_kk_at_least_n_falls_back() -> None:
    rng = np.random.default_rng(7)
    d2 = rng.integers(0, 2, (6, 80)).astype(float)
    for kk in (80, 81, 200):
        assert np.array_equal(_topk_row_idx(d2.copy(), kk), _ref(d2, kk))


@settings(max_examples=60, deadline=None)
@given(
    rows=st.integers(1, 8),
    n=st.integers(65, 200),
    kk=st.integers(1, 9),
    nvals=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_topk_idx_property(rows: int, n: int, kk: int, nvals: int, seed: int) -> None:
    # ties are the adversarial surface: draw from a SMALL value set so
    # boundary tie classes are deep and frequent
    rng = np.random.default_rng(seed)
    d2 = rng.integers(0, nvals, (rows, n)).astype(float)
    assert np.array_equal(_topk_row_idx(d2.copy(), kk), _ref(d2, kk))
