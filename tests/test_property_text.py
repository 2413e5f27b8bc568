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


@settings(max_examples=5, deadline=None, derandomize=True)
@given(texts=_corpus)
def test_bpe_encode_fixed_vocab_matches_greedy_replay(spark, texts):
    """t14's contract, property-tested: for ANY corpus, the Arrow
    kernel under the pinned vocab equals a local single-pass greedy
    replay (the same semantics the SQL oracle's wrapped-symbol
    replace implements), and reconstruction always holds."""
    from vector_database_spark.workload import _T14_MERGES

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_words, r.n_bpe_tokens, r.reconstruction_ok)
        for r in tx.bpe_encode(df, _T14_MERGES).collect()
    }

    def enc(word):
        sym = list(word) + ["</w>"]
        for a, b in _T14_MERGES:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    for i, t in enumerate(texts):
        words = t.lower().split()
        want_tokens = sum(len(enc(w)) for w in words)
        assert got[i] == (len(words), want_tokens, True), (i, t)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    toks=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    cap=st.integers(8, 24),
)
def test_pack_sequences_greedy_property(spark, toks, cap):
    """For ANY token-length sequence and capacity: bins never exceed
    capacity unless single-doc, offsets are exact running sums, and
    the packing equals a local greedy replay on each shard's
    id-ordered rows."""
    from vector_database_spark.pipeline import pack_sequences

    texts = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = pack_sequences(df, capacity=cap, n_shards=4).collect()
    assert len(out) == len(toks)
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        acc = pack = None
        for r in rows:
            if acc is None:
                want = (0, 0)
                acc, pack = r.n_tok, 0
            elif acc + r.n_tok > cap:
                pack += 1
                want = (pack, 0)
                acc = r.n_tok
            else:
                want = (pack, acc)
                acc += r.n_tok
            assert (r.pack_id, r.seq_offset) == want, (shard, r.doc_id)
            assert toks[r.doc_id] == r.n_tok


def test_canonical_url_matches_duckdb_twin(spark):
    """canonical_url vs its DuckDB scalar twin on the adversarial
    battery: case, default/non-default ports, tracking params, param
    order, fragments, schemeless, empty, bare '?' — byte-identical
    (this is the gate's exactness in miniature; the LIKE-escape
    divergence between the engines is the trap the twin encodes)."""
    import duckdb
    import pandas as pd

    from vector_database_spark.operators.text import (
        canonical_url,
        canonical_url_sql,
    )

    urls = [
        "HTTPS://Example.COM:443/Path/Page?b=2&utm_source=x&a=1#frag",
        "http://example.com:80/",
        "http://EXAMPLE.com",
        "https://example.com/p?utm_campaign=z",
        "https://example.com/p?ref=tw&fbclid=123&z=9&a=1",
        "not a url at all?x=1&utm_x=2#f",
        "ftp://Host.Net:21/file",
        "https://example.com/CaseSensitivePath",
        "//schemeless.com/x",
        "",
        "https://example.com/?",
        "http://h/?utm_a=1&utm_b=2",
        "https://a.b:8443/x?a=2&a=1",  # repeated key: sort keeps both
        "HTTP://U:80",                  # authority only, port, no path
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.c for r in df.select(canonical_url("u").alias("c")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls}))
    want = [
        r[0]
        for r in con.sql(
            f"SELECT {canonical_url_sql('u')} FROM t"
        ).fetchall()
    ]
    assert got == want
    # idempotence: canonicalizing a canonical form is a no-op
    df2 = spark.createDataFrame([(c,) for c in got], "u string")
    again = [r.c for r in df2.select(canonical_url("u").alias("c")).collect()]
    assert again == got
