"""Property-based contracts for the text pipeline additions: for ANY
document set, (a) chunking tiles the token sequence exactly (every
token covered, chunk count = ceil(n/stride), reassembly at
stride==size reproduces the tokens); (b) repetition fractions sit in
[0,1] and agree with a local python oracle; (c) PII scrubbing is
idempotent and count-consistent with a local re2-free oracle."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_database_spark.operators import text as tx

_WORDS = ["red", "blue", "fox", "a1", "b2b", "x", "jump", "dog"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=40).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(texts=_corpus, size=st.integers(2, 6), stride=st.integers(1, 6))
def test_chunking_tiles_exactly(spark, texts, size, stride):
    stride = min(stride, size)  # overlapping or exact tiling only
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = tx.chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    for i, t in enumerate(texts):
        toks = t.lower().split()
        n = len(toks)
        want_chunks = max(1, -(-n // stride))
        chunks = by_doc[i]
        assert set(chunks) == set(range(want_chunks))
        seen = []
        for c in range(want_chunks):
            got = chunks[c].chunk_text.split()
            assert got == toks[c * stride : c * stride + size]
            assert chunks[c].n_chunk_tokens == len(got)
            seen.extend(got if stride == size else [])
        if stride == size:  # exact tiling: concatenation reassembles
            assert seen == toks


@settings(max_examples=5, deadline=None, derandomize=True)
@given(texts=_corpus)
def test_repetition_stats_match_local_oracle(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.id: r for r in tx.repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        n = len(toks)
        from collections import Counter

        uc = Counter(toks)
        bgs = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        r = got[i]
        assert r.n_tokens == n
        assert r.top_word_frac == round(max(uc.values()) / n, 4)
        if bgs:
            tot = sum(bgs.values())
            assert r.dup_bigram_frac == round(1 - len(bgs) / tot, 4)
            assert r.top_bigram_frac == round(max(bgs.values()) / tot, 4)
        else:
            assert r.dup_bigram_frac == 0.0 and r.top_bigram_frac == 0.0
        for v in (r.top_word_frac, r.dup_bigram_frac, r.top_bigram_frac):
            assert 0.0 <= v <= 1.0


_pii_bits = st.sampled_from(
    ["plain", "words", "u7@ex.io", "10.0.3.77", "555-0123 456", "a.b", "1.2"]
)
_pii_doc = st.lists(_pii_bits, min_size=1, max_size=10).map(" ".join)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(texts=st.lists(_pii_doc, min_size=1, max_size=6))
def test_pii_scrub_idempotent_and_counts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = {r.id: r for r in tx.pii_scrub(df).collect()}
    # local oracle with python re (same pattern subset)
    for i, t in enumerate(texts):
        r = once[i]
        for name, pat, _repl in tx.PII_PATTERNS:
            assert getattr(r, f"n_{name}") == len(re.findall(pat, t)), (t, name)
        s = t
        for _name, pat, repl in tx.PII_PATTERNS:
            s = re.sub(pat, repl, s)
        assert r.scrubbed == s
    # idempotence: scrubbing the scrubbed text changes nothing
    df2 = spark.createDataFrame(
        [(i, r.scrubbed) for i, r in once.items()], "doc_id long, text string"
    )
    twice = {r.id: r for r in tx.pii_scrub(df2).collect()}
    for i in once:
        assert twice[i].scrubbed == once[i].scrubbed
        assert (twice[i].n_email, twice[i].n_ip, twice[i].n_phone) == (0, 0, 0)
