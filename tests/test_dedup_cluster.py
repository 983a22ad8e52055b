"""Connected-components dedup clustering: multi-round convergence on a
chain-shaped corpus (diameter > 1, so one propagation round is NOT enough)
and canonical kept-doc selection, checked against a driver-side union-find
over the engine's own verified pair set."""

import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.functions.dedup import (
    CLUSTER_JACCARD,
    dedup_canonical,
    dedup_clusters,
    minhash_lsh_pairs,
)


@pytest.fixture(scope="module")
def chain_docs(spark):
    # sliding 8-token windows, stride 2: consecutive docs share 6/10 tokens
    # (jaccard 0.6 >= threshold), stride-2 docs share 4/12 (0.33 < threshold)
    # -> the near-dup graph is (at most) a chain; plus two isolated docs.
    # words must hash to SPREAD values: sequential words like "w0001" give
    # near-sequential rolling hashes, which degenerates every linear
    # minhash family to "a * min_token + b" (no band ever collides)
    import hashlib

    def word(j):
        return hashlib.md5(f"word-{j}".encode()).hexdigest()[:10]

    rows = []
    for i in range(12):
        toks = [word(j) for j in range(2 * i, 2 * i + 8)]
        rows.append((100 + i, " ".join(toks)))
    rows.append((500, "island unique tokens alpha beta"))
    rows.append((501, "another disjoint doc gamma delta"))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return find


def test_chain_clusters_match_union_find(spark, chain_docs):
    edge_rows = [
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(chain_docs)
        .filter(F.col("jaccard") >= CLUSTER_JACCARD)
        .collect()
    ]
    # the chain must need >1 propagation round to converge
    assert len(edge_rows) >= 3
    find = _union_find(edge_rows)
    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(chain_docs).collect()}
    assert set(labels) == {100 + i for i in range(12)} | {500, 501}
    for doc, cl in labels.items():
        assert cl == min(
            d for d in labels if find(d) == find(doc)
        ), f"doc {doc}: got {cl}"
    # isolated docs label themselves
    assert labels[500] == 500 and labels[501] == 501


def test_canonical_picks_longest_then_smallest(spark, chain_docs):
    out = {r.cluster_id: r for r in dedup_canonical(chain_docs).collect()}
    sizes = {r.cluster_id: r.n_members for r in out.values()}
    assert sum(sizes.values()) == 14  # every doc in exactly one cluster
    texts = {r.doc_id: r.text for r in chain_docs.collect()}
    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(chain_docs).collect()}
    for cl, row in out.items():
        members = [d for d, c in labels.items() if c == cl]
        best = min(members, key=lambda d: (-len(texts[d]), d))
        assert row.kept_doc == best
        assert row.kept_len == len(texts[best])
