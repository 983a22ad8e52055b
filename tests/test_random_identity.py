"""Randomized identity checks: the distributed operator on ONE seeded
random input must equal a brute-force numpy/pandas evaluation — property
coverage beyond the structured synthetic corpus, in a single Spark job per
operator (hypothesis-per-example would pay Spark latency per case)."""

import numpy as np

SEED = 20260817


def test_overlap_count_matches_bruteforce(spark):
    from fast_carpenter_spark.functions.interval import overlap_count

    rng = np.random.default_rng(SEED)
    n = 200
    start = rng.integers(0, 10_000, n)
    length = rng.integers(0, 800, n)
    end = start + length
    rows = [
        (int(i // 7), int(i), int(s), int(e))
        for i, (s, e) in enumerate(zip(start, end))
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, session_id bigint, sess_start_us bigint, sess_end_us bigint"
    )
    got = {
        (r["user_id"], r["session_id"]): r["n_concurrent"]
        for r in overlap_count(df, bin_us=500).collect()
    }
    # brute force: closed-interval overlap, self excluded
    s, e = start[:, None], end[:, None]
    ov = (s <= e.T) & (s.T <= e)
    np.fill_diagonal(ov, False)
    want = ov.sum(axis=1)
    assert len(got) == n
    for i in range(n):
        assert got[(i // 7, i)] == want[i], i


def test_dbscan_matches_bruteforce(spark):
    from fast_carpenter_spark.spatial.cluster import dbscan

    rng = np.random.default_rng(SEED)
    n, eps, min_pts = 150, 6.0, 4
    lon = rng.uniform(-60, 60, n)
    lat = rng.uniform(-40, 40, n)
    df = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(n)],
        "doc_id bigint, lon double, lat double",
    )
    got = {
        r["doc_id"]: (r["role"], r["cluster_id"])
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }
    # brute force DBSCAN with the same deterministic conventions
    d2 = (lon[:, None] - lon) ** 2 + (lat[:, None] - lat) ** 2
    nbr = d2 <= eps * eps
    np.fill_diagonal(nbr, False)
    core = nbr.sum(axis=1) + 1 >= min_pts
    # components over core-core adjacency (min-label fixpoint)
    lbl = np.where(core, np.arange(n), -1)
    changed = True
    while changed:
        changed = False
        for i in np.nonzero(core)[0]:
            js = np.nonzero(nbr[i] & core)[0]
            if len(js):
                m = min(lbl[i], lbl[js].min())
                if m < lbl[i]:
                    lbl[i] = m
                    changed = True
    for i in range(n):
        if core[i]:
            assert got[i] == ("core", int(lbl[i])), i
        else:
            core_nbrs = np.nonzero(nbr[i] & core)[0]
            if len(core_nbrs):
                assert got[i] == ("border", int(lbl[core_nbrs].min())), i
            else:
                assert got[i] == ("noise", -1), i


def test_trained_pq_codebook_matches_bruteforce(spark):
    """The k-means training recurrence (ntile seeding -> exact-integer
    argmin E-step -> floor-mean M-step, empty codes carried) on one seeded
    RANDOM table must equal a direct numpy evaluation — the SQL chain's
    semantics pinned independently of the DuckDB twin."""
    from fast_carpenter_spark.functions.pq import (
        M_SUB, SUB_DIM, trained_codebook,
    )

    rng = np.random.default_rng(SEED + 3)
    n, k, rounds = 120, 8, 2
    vecs = rng.integers(-999, 1000, (n, M_SUB * SUB_DIM))
    rows = [(int(i), [int(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<bigint>")
    got = {
        (r["m"], r["code"], r["d"]): r["comp"]
        for r in trained_codebook(df, k=k, rounds=rounds).collect()
    }

    for m in range(M_SUB):
        sv = vecs[:, m * SUB_DIM : (m + 1) * SUB_DIM]
        order = sorted(range(n), key=lambda i: (tuple(sv[i]), i))
        # ntile(k): first (n % k) buckets take ceil(n/k) rows
        sizes = [n // k + (1 if b < n % k else 0) for b in range(k)]
        cents, pos = [], 0
        for b in range(k):
            cents.append(sv[order[pos]].astype(np.int64))
            pos += sizes[b]
        cents = np.array(cents)
        for _ in range(rounds):
            d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest code (argmin does)
            new = cents.copy()  # empty codes keep the previous centroid
            for c in range(k):
                members = sv[assign == c]
                if len(members):
                    # exact floor-mean per dim (Python // floors)
                    new[c] = members.sum(axis=0) // len(members)
            cents = new
        for c in range(k):
            for d in range(SUB_DIM):
                assert got[(m, c, d)] == cents[c][d], (m, c, d)
