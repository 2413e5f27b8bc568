"""Property-based checks for the round-6 retrieval surface: for ANY
small corpus, BM25 must equal an independent pure-Python replay,
MaxSim must equal a numpy replay, containment must obey its set-algebra
bounds against Jaccard, and RRF must be rank-only (invariant to score
scales)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_word = st.sampled_from(["join", "hash", "scan", "merge", "filter", "row"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    """Independent reference: same formula, same fold orders."""
    toks = [t.lower().split() for t in texts]
    dls = {i: len(ws) for i, ws in enumerate(toks) if ws}
    n = len(texts)
    avgdl = sum(dls.values()) / n if n else 1.0
    dfq = {
        t: sum(1 for ws in toks if t in ws)
        for t in terms
    }
    out = {}
    for i, ws in enumerate(toks):
        score, matched = 0.0, 0
        for t in sorted(set(terms)):  # term-sorted fold — the engine rule
            tf = ws.count(t)
            if tf == 0 or not dfq[t]:
                continue
            matched += 1
            idf = (float(n) - dfq[t] + 0.5) / (dfq[t] + 0.5) + 1.0
            score += idf * (
                (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * (dls[i] / avgdl)))
            )
        if matched:
            out[i] = (matched, score)
    return out


@settings(max_examples=8, deadline=None, derandomize=True)
@given(corpus=_corpus)
def test_bm25_equals_python_replay(spark, corpus):
    from vector_database_spark.operators.text import bm25_scores

    terms = ["join", "merge", "filter"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_matched, r.score)
        for r in bm25_scores(df, terms).collect()
    }
    want = _py_bm25(corpus, terms)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert math.isclose(got[i][1], want[i][1], rel_tol=0, abs_tol=1e-12), (
            i, got[i], want[i],
        )


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=3, max_size=3,
        ),
        min_size=4, max_size=16,
    )
)
def test_maxsim_equals_numpy_replay(spark, vecs):
    import numpy as np

    from vector_database_spark.operators.search import maxsim_topk

    docs = spark.createDataFrame(
        [(i // 2, i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "doc_id long, id long, vector array<double>",
    )
    queries = docs.where(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("qid"), F.col("id").alias("qtok"),
        F.col("vector").alias("qvec"),
    )
    got = {
        r.doc: r.score
        for r in maxsim_topk(docs, queries, k=100, metric="dot").collect()
    }
    by_doc = {}
    for i, v in enumerate(vecs):
        by_doc.setdefault(i // 2, []).append(np.asarray(v, dtype=np.float64))
    Q = by_doc[0]
    for d, vs in by_doc.items():
        want = sum(max(float(q @ v) for v in vs) for q in Q)
        assert math.isclose(got[d], want, rel_tol=0, abs_tol=1e-9), (d, got[d], want)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(corpus=st.lists(
    st.lists(_word, min_size=3, max_size=10).map(" ".join),
    min_size=2, max_size=6,
))
def test_containment_bounds_vs_jaccard(spark, corpus):
    """J(a,b) <= min(C(a->b), C(b->a)); C in (0, 1]; and C(a->b)=1
    exactly when a's shingle set is a subset of b's."""
    from vector_database_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    cont = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_pairs(df, threshold=1e-9).collect()
    }
    jac = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=1e-9).collect()
    }
    shingles = {}
    for i, t in enumerate(corpus):
        ws = t.lower().split()
        shingles[i] = {
            " ".join(ws[j : j + 3]) for j in range(max(len(ws) - 2, 0))
        }
    for (a, b), j in jac.items():
        ca, cb = cont.get((a, b)), cont.get((b, a))
        assert ca is not None and cb is not None
        assert j <= min(ca, cb) + 1e-12
    for (s, d), c in cont.items():
        assert 0.0 < c <= 1.0 + 1e-12
        if shingles[s] and shingles[s] <= shingles[d]:
            assert math.isclose(c, 1.0, abs_tol=1e-12)
        if math.isclose(c, 1.0, abs_tol=1e-12):
            assert shingles[s] <= shingles[d]


def test_rrf_rank_only_invariance(spark):
    """RRF must depend only on ranks: feeding rankings whose scores
    differ by arbitrary monotone transforms changes nothing, and a doc
    in both lists at rank r beats a doc in one list at the same r."""
    from vector_database_spark.operators.search import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "qid long, id long, rank long"
    )
    l2 = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 30, 3)], "qid long, id long, rank long"
    )
    out = {r.id: (r.n_lists, r.score, r.rank) for r in rrf_fuse([l1, l2], 10).collect()}
    assert out[20][0] == 2 and out[30][0] == 2 and out[10][0] == 1
    # both-lists doc 20 (ranks 2,1) beats single-list doc 10 (rank 1)
    assert out[20][2] == 1
    expected_20 = 1.0 / (60.0 + 2) + 1.0 / (60.0 + 1)
    assert math.isclose(out[20][1], expected_20, abs_tol=1e-15)
