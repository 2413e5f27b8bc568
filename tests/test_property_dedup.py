"""Property-based contracts for the dedup family: for ANY document
set, (a) MinHash-LSH + exact refinement finds EXACTLY the pairs whose
true Jaccard clears the threshold that the LSH banding can see, and a
direct all-pairs Jaccard is the oracle; (b) connected components is a
fixpoint (relabeling the labeled graph changes nothing) and labels are
the min reachable id."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_database_spark.operators import dedup as dd

_WORDS = ["red", "blue", "fox", "jump", "over", "lazy", "dog", "cat"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=12)


def _true_jaccard_pairs(texts: list[str], n: int, threshold: float):
    def shingles(t: str):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = set()
    ss = [shingles(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not ss[a] or not ss[b]:
                continue
            j = len(ss[a] & ss[b]) / len(ss[a] | ss[b])
            if j >= threshold:
                out.add((a, b))
    return out


@settings(max_examples=5, deadline=None, derandomize=True)
@given(texts=_corpus)
def test_ngram_jaccard_matches_local_oracle(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.a_id, r.b_id)
        for r in dd.ngram_jaccard_pairs(df, shingle_n=2, threshold=0.3).collect()
    }
    want = _true_jaccard_pairs(texts, 2, 0.3)
    assert got == want, (sorted(got), sorted(want))


@pytest.mark.parametrize("method", ["minlabel", "star"])
@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=12
    )
)
def test_connected_components_min_label_fixpoint(spark, method, edges):
    nodes = spark.range(10).select(F.col("id"))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(0, 0)], "a_id long, b_id long"
    ).where(F.col("a_id") != F.col("b_id"))
    lab = dd.connected_components(pairs, nodes, method=method)
    got = {r.id: r.component for r in lab.collect()}

    # local oracle: min reachable id by union-find
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(10)}
    assert got == want, (got, want)
