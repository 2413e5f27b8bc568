"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python UDFs): language-ID heuristic,
quality scoring, token counting, and a polynomial document fingerprint
— each reproducible in ANSI SQL so the DuckDB oracle can hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.hashing import tokens

# Tiny per-language stopword panels for the n-gram/stopword language
# heuristic. Ordered dict of language -> markers.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "para", "que"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "für", "mit", "von"],
}

# A BPE-ish pre-tokenization: words | numbers | single non-space symbol.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = 2147483647  # 2^31 - 1, Mersenne prime


def token_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token statistics:
    (id, n_tokens, n_unique_tokens, avg_token_len, n_chars)."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def stopword_ratio(text_col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = tokens(text_col)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop.cast("double") / F.size(toks)


def language_scores(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-panel language ID: per-language ratio + argmax pick.

    (id, <lang>_ratio..., pred_lang). Deterministic tie-break: first
    language in panel order wins (greatest(...) comparison chain).
    """
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    for lang in STOPWORDS:
        out = out.withColumn(f"{lang}_ratio", stopword_ratio(F.col("_t"), lang))
    langs = list(STOPWORDS)
    pred = F.lit(langs[0])
    best = F.col(f"{langs[0]}_ratio")
    for lang in langs[1:]:
        cur = F.col(f"{lang}_ratio")
        pred = F.when(cur > best, F.lit(lang)).otherwise(pred)
        best = F.when(cur > best, cur).otherwise(best)
    return out.select(
        "id", *[F.round(F.col(f"{lang}_ratio"), 4).alias(f"{lang}_ratio") for lang in langs],
        pred.alias("pred_lang"),
    )


def quality_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    length band, mean word length band, stopword presence, uniqueness.
    (id, *keep_cols, n_tokens, len_ok, wordlen_ok, stop_ok,
    uniq_ratio, score). ``keep_cols`` pass through so downstream
    aggregations (per-domain profiles) never need a self-join back to
    the source table."""
    toks = tokens(text_col)
    n = F.size(toks)
    avg_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast(
        "double"
    ) / n
    uniq = F.size(F.array_distinct(toks)).cast("double") / n
    stop = stopword_ratio(F.col(text_col))
    len_ok = (n >= 5) & (n <= 100000)
    wordlen_ok = (avg_len >= 2.0) & (avg_len <= 12.0)
    stop_ok = stop >= 0.05
    score = (
        len_ok.cast("double") * 0.3
        + wordlen_ok.cast("double") * 0.3
        + stop_ok.cast("double") * 0.2
        + uniq * 0.2
    )
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        n.alias("n_tokens"),
        len_ok.alias("len_ok"),
        wordlen_ok.alias("wordlen_ok"),
        stop_ok.alias("stop_ok"),
        F.round(uniq, 4).alias("uniq_ratio"),
        F.round(score, 4).alias("score"),
    )


def regex_token_count(text_col: Column | str) -> Column:
    """BPE-ish pre-tokenizer count (words/numbers/symbols)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def fingerprint(text_col: Column | str) -> Column:
    """Polynomial rolling hash of the normalized text modulo 2^31-1.

    fold(acc, ch) = (acc * 31 + ascii(ch)) % p, acc0 = 0 — identical
    to DuckDB's ``list_reduce`` over the same codes, enabling exact
    cross-engine fingerprint comparison.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    # split('') gives one-char elements in one pass; per-index substr
    # would rescan the string per character (O(n^2)).
    chars = F.split(norm, "")
    codes = F.transform(chars, F.ascii)
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + ch) % F.lit(FINGERPRINT_MOD),
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token-window chunks:
    ``(doc_id, chunk_id, n_chunk_tokens, chunk_text)``.

    This is the reference's own data model made into an operator: the
    reference stores a Document and its Text CHUNKS as separate rows
    (`DDL.sql:302-326`) but leaves the chunking itself to the caller;
    an embedding pipeline needs it as a first-class step. Chunk i
    covers tokens [i*stride+1 .. i*stride+size] (1-based), i in
    [0, ceil(n_tokens/stride)); the last chunk may be shorter, and
    with stride < size consecutive chunks overlap by (size - stride)
    tokens so no embedding window loses cross-boundary context.

    Shape at scale: one narrow projection — per-row tokenize, a
    sequence/explode over chunk starts, one array slice per chunk. No
    shuffle at all; output partitioning inherits the scan, so the
    downstream embed/index stages repartition however they need.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(stride)).cast("int"), F.lit(1)
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(size)
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def repetition_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals:
    ``(id, n_tokens, top_word_frac, dup_bigram_frac, top_bigram_frac)``.

    - top_word_frac: count of the most frequent token / n_tokens
      (the "fraction in most common word" filter);
    - dup_bigram_frac: 1 - distinct_bigrams/total_bigrams — mass of
      repeated 2-grams (template/spam smell pairwise near-dup
      thresholds don't see);
    - top_bigram_frac: count of the most frequent 2-gram / n_bigrams.

    Shape at scale: one explode into (doc, token) rows, a lead-window
    per doc for bigrams (doc-partitioned — the same layout the shingle
    passes use), then two map-side-combinable hash aggregates joined
    on doc id. No driver state, no quadratic step.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
    )
    ug = ex.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    us = ug.groupBy("id").agg(
        F.sum("c").alias("n_tokens"), F.max("c").alias("top_word")
    )
    w = Window.partitionBy("id").orderBy("pos")
    bg = (
        ex.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("id", F.concat_ws(" ", "tok", "nxt").alias("bg"))
    )
    bgc = bg.groupBy("id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bs = bgc.groupBy("id").agg(
        F.sum("c").alias("n_bg"),
        F.count(F.lit(1)).alias("n_distinct_bg"),
        F.max("c").alias("top_bg"),
    )
    out = us.join(bs, "id", "left")
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("top_word").cast("double") / F.col("n_tokens"), 4).alias(
            "top_word_frac"
        ),
        F.round(
            F.coalesce(
                F.lit(1.0)
                - F.col("n_distinct_bg").cast("double") / F.col("n_bg"),
                F.lit(0.0),
            ),
            4,
        ).alias("dup_bigram_frac"),
        F.round(
            F.coalesce(
                F.col("top_bg").cast("double") / F.col("n_bg"), F.lit(0.0)
            ),
            4,
        ).alias("top_bigram_frac"),
    )


# PII scrub patterns: applied IN ORDER (earlier replacements remove
# text later patterns might otherwise match). Every pattern sticks to
# the regex subset where Java regex (Spark) and RE2 (DuckDB) agree:
# literal classes + bounded/greedy quantifiers, no backrefs, no
# lookaround, no \b.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("phone", r"\d[\d -]{5,}\d", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact PII spans (emails, IPv4 addresses, phone-like digit
    runs) and count them: ``(id, n_email, n_ip, n_phone, scrubbed)``.

    Counts are taken on the ORIGINAL text (all patterns), then the
    replacements are applied sequentially in PII_PATTERNS order, so
    e.g. an IP consumed by an email replacement is still counted once
    as seen. Pure Catalyst regexp expressions — one narrow projection,
    no shuffle, no Python in the row path.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = c
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        F.col(id_col).alias("id"), *counts, scrubbed.alias("scrubbed")
    )


def tfidf_top_terms(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
):
    """Per-document top-k terms by tf-idf:
    ``(id, term, tfidf, rank)``.

    The training-data keyword/statistics pass: term frequency within
    the document × inverse document frequency across the corpus. The
    idf here is the RATIONAL form (N+1)/(df+1) rather than its log —
    a strictly monotone transform that preserves the ranking while
    keeping every value exact rational-double arithmetic, so an
    external SQL oracle reproduces the scores bit-for-bit (libm log
    implementations are not guaranteed identical across engines).

    Shape at scale: one explode + two hash aggregates (term counts
    per doc; document frequency per term — both map-side combinable),
    one broadcast-or-shuffle join of the tiny df table, one top-k
    window per doc. No driver state.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    tf = ex.groupBy("id", "term").agg(F.count(F.lit(1)).alias("c"))
    doc_len = tf.groupBy("id").agg(F.sum("c").alias("n_toks"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = (
        tf.join(doc_len, "id")
        .join(doc_freq, "term")
        .withColumn(
            "tfidf",
            (F.col("c") / F.col("n_toks"))
            * (F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1))),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("id", "term", "tfidf", "rank")
    )


def hashing_embed_long(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 64,
    signed: bool = True,
) -> DataFrame:
    """Feature-hashing document embedding, LONG format:
    ``(id, bucket, weight)`` — token counts folded into ``dims``
    md5-hash buckets (signed hashing trick: an independent hash bit
    decides +/-, which unbiases collision noise), L2-normalized per
    document. Every value is exact integer arithmetic + one
    correctly-rounded sqrt, so an external SQL engine reproduces the
    embedding bit-for-bit.

    Shape at scale: one explode + two map-side-combinable hash
    aggregates (token-fold, then per-doc norm) — the same profile as
    the token-stats pass. The dense form is `hashing_embed`.
    """
    from vector_database_spark.functions.hashing import h60

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    bucket = (h60("tok") % F.lit(int(dims))).cast("int")
    if signed:
        sign = F.when(
            (h60(F.concat(F.lit("s:"), F.col("tok"))) % 2) == 0, F.lit(1)
        ).otherwise(F.lit(-1))
    else:
        sign = F.lit(1)
    folded = (
        ex.select("id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("id", "bucket")
        .agg(F.sum("s").cast("long").alias("c"))
        .where(F.col("c") != 0)  # signed collisions can cancel exactly
    )
    norm = folded.groupBy("id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("_n")
    )
    return (
        folded.join(norm, "id")
        .select(
            "id",
            "bucket",
            (F.col("c").cast("double") / F.col("_n")).alias("weight"),
        )
    )


def hashing_embed(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 64,
    signed: bool = True,
) -> DataFrame:
    """Dense form of `hashing_embed_long`: ``(id, vector)`` with
    ``vector: array<double>`` of length ``dims`` — the bridge from the
    text table into every vector operator (index build, kNN, SQ8/PQ,
    embedding near-dup) with zero model dependencies and full
    cross-engine determinism."""
    long = hashing_embed_long(
        df, id_col=id_col, text_col=text_col, dims=int(dims), signed=signed
    )
    g = long.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
        ).alias("_m")
    )
    return g.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(int(dims) - 1)),
            lambda i: F.coalesce(
                F.try_element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
            ),
        ).alias("vector"),
    )


BPE_END = "</w>"


def bpe_train(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 262_144,
) -> list[tuple[str, str]]:
    """Learn a byte-pair-encoding merge table from the corpus.

    Distributed shape (the classic BPE factorization): ONE word-count
    aggregate over the corpus (map-side combinable shuffle), then the
    merge loop runs over the DISTINCT-WORD vocabulary with its
    frequencies — at 100 TB the corpus is petabytes but the weighted
    word vocabulary is millions of rows; ``max_words`` caps the
    driver copy to the most frequent words (standard practice: rare
    words contribute negligible pair mass). Fully deterministic:
    ties break on the lexicographically smallest pair, words ordered
    by (count desc, word asc).

    Returns the ordered merge list [(left, right), ...] consumed by
    `bpe_encode`.
    """
    # SAME word segmentation as bpe_encode's kernel (the explicit
    # ASCII class + chr(31)): training and encoding MUST split
    # identically or merges learned over one segmentation mis-apply
    # under the other (Java \s includes \x0B and excludes nothing the
    # kernel's class has; a corpus byte like \x0B would diverge them)
    toks = F.split(F.lower(F.trim(F.col(text_col))), "[\\t\\n\\f\\r \\x1f]+")
    wc = (
        df.select(F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in wc:
        sym = tuple(list(r.w) + [BPE_END])
        vocab[sym] = vocab.get(sym, 0) + int(r.c)
    # Incremental pair-count maintenance (round-3 verdict item 6): the
    # full O(vocab x word_len) pair recount + vocab rebuild per merge
    # becomes touch-only-affected-words — `pairs` holds the live
    # weighted pair counts, `where_` indexes pair -> words containing
    # it, and a merge removes/re-adds ONLY the words in where_[pair].
    # The multiset of counts is identical to a from-scratch recount
    # (each affected word is fully removed then re-added), so the
    # deterministic selection rule picks the same merges.
    pairs: dict[tuple[str, str], int] = {}
    where_: dict[tuple[str, str], set] = {}

    def _add_word(sym: tuple, c: int) -> None:
        for p in zip(sym, sym[1:]):
            pairs[p] = pairs.get(p, 0) + c
            where_.setdefault(p, set()).add(sym)

    def _remove_word(sym: tuple, c: int) -> None:
        for p in zip(sym, sym[1:]):
            left = pairs[p] - c
            if left:
                pairs[p] = left
            else:
                del pairs[p]
            s = where_.get(p)
            if s is not None:
                s.discard(sym)
                if not s:
                    del where_[p]

    for sym, c in vocab.items():
        _add_word(sym, c)
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        if not pairs:
            break
        # deterministic: highest count, then lexicographically SMALLEST
        top_count = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == top_count)
        if top_count < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for sym in list(where_.get(pair, ())):
            c = vocab.pop(sym)
            _remove_word(sym, c)
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            vocab[t] = vocab.get(t, 0) + c
            _add_word(t, c)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned BPE merge table:
    ``(id, n_words, n_bpe_tokens, reconstruction_ok)``.

    Arrow-batched kernel, merges closed over as a plain list (the
    pickling rule every kernel here follows); per-batch distinct-word
    memoization makes the cost proportional to distinct words per
    batch, not tokens. ``reconstruction_ok`` asserts in-row that
    joining the BPE tokens reproduces the normalized word — the
    tokenizer is self-checking wherever it runs.
    """
    rules = [(str(a), str(b)) for a, b in merges]

    def kern(batches):
        import re

        import pandas as pd

        # Tokenize on the RE2/Java/python-re COMMON whitespace subset
        # (the PII-pattern rule): an explicit ASCII class, never
        # str.split() — Python's str.split treats \x1c-\x1f, \x85 and
        # NBSP as separators while DuckDB's RE2 \s+ does not, so the
        # two sides would diverge the day a regen emits such bytes.
        # chr(31) is ALSO a separator here because the SQL replay
        # wraps symbols in chr(31); a literal \x1f inside a word would
        # corrupt the oracle's separator-count token counting.
        ws = re.compile("[\t\n\f\r \x1f]+")

        memo: dict = {}

        def enc(word):
            got = memo.get(word)
            if got is None:
                sym = list(word) + ["</w>"]
                for a, b in rules:
                    if a not in sym:
                        continue
                    out = []
                    i = 0
                    while i < len(sym):
                        if (
                            i + 1 < len(sym)
                            and sym[i] == a
                            and sym[i + 1] == b
                        ):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(sym[i])
                            i += 1
                    sym = out
                got = sym
                memo[word] = got
            return got

        for pdf in batches:
            ids, nw, nt, ok = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                # NULL text: zero words, vacuously reconstructed
                # (the expression-based gates tolerate NULLs; the
                # kernels must not crash the job on one bad row)
                words = (
                    []
                    if t is None
                    else [w for w in ws.split(t.lower()) if w]
                )
                total = 0
                good = True
                for w in words:
                    sym = enc(w)
                    total += len(sym)
                    if "".join(sym) != w + "</w>":
                        good = False
                ids.append(i)
                nw.append(len(words))
                nt.append(total)
                ok.append(good)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "n_words": pd.array(nw, dtype="int64"),
                    "n_bpe_tokens": pd.array(nt, dtype="int64"),
                    "reconstruction_ok": pd.array(ok, dtype="boolean"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kern, "id long, n_words long, n_bpe_tokens long, reconstruction_ok boolean"
    )


def exact_substring_stats(
    df: DataFrame,
    *,
    span_len: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Char-level exact-substring duplication profile (the
    "deduplicating training data makes LMs better" exact-substring
    method, Lee et al. 2022, at fixed span length): for every doc,
    how many of its length-`span_len` character spans occur MORE THAN
    ONCE in the whole corpus (any doc, any position — including
    self-repeats). Returns (id, n_spans, n_dup_spans, dup_fraction).

    Shape: explode every start position (the method is inherently
    O(total chars) rows — the suffix-array formulation shares that
    bound), hash the span with md5 (engine-portable), count
    occurrences with ONE window over the hash (single shuffle), then
    one per-doc aggregate. substring/md5 are flat codegen
    expressions — per-position work stays JVM, never an interpreted
    array lambda. At 100 TB this is the pipeline's heavy pass by
    nature; span hashes are uniform so the shuffle has no skew, and
    a stride>1 scan (trading exactness for cost) composes by
    filtering `pos % stride = 1` before the window."""
    from pyspark.sql.window import Window

    L = int(span_len)
    spans = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.when(
                F.length(text_col) >= L,
                F.sequence(F.lit(1), F.length(text_col) - (L - 1)),
            ).otherwise(F.array())
        ).alias("pos"),
        F.col(text_col).alias("_t"),
    ).select(
        "id", F.md5(F.expr(f"substring(_t, pos, {L})")).alias("h")
    )
    n = F.count("*").over(Window.partitionBy("h"))
    dup = (n > 1).cast("long")
    return (
        spans.select("id", dup.alias("is_dup"))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum("is_dup").cast("long").alias("n_dup_spans"),
            F.round(
                F.sum("is_dup").cast("double") / F.count("*"), 6
            ).alias("dup_fraction"),
        )
    )


def inverted_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-level inverted index (the IR primitive behind the
    reference's text-search data model, DDL.sql Document/TextChunk):
    one row per term with document frequency, collection frequency,
    and the sorted distinct-doc postings list (comma-joined string —
    engine-portable and oracle-hashable). ONE explode + ONE hash
    aggregate keyed on the term: map-side partials collapse each
    partition's postings before the single shuffle; no joins."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    return toks.groupBy("term").agg(
        F.count_distinct("id").cast("long").alias("df"),
        F.count("*").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def bigram_rows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-bigram counts ``(id, bigram, k)`` —
    the corpus-statistics primitive behind `bigram_lm_score`.

    Arrow kernel (per-token/char work is exactly where the array-HOF
    expression path is 8x too slow — the documented trade-off), with
    in-kernel per-doc aggregation: output rows per doc are bounded by
    the alphabet squared (≤ a few hundred for natural text), NOT by
    document length, so the downstream shuffles move counts, never
    characters. Bigrams are over ``lower(text)`` verbatim (spaces
    included — word boundaries carry signal); NULL/short texts emit
    no rows."""

    def kern(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids, bgs, ks = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                s = t.lower()
                if len(s) < 2:
                    continue
                c = Counter(s[j : j + 2] for j in range(len(s) - 1))
                for bg, k in c.items():
                    ids.append(i)
                    bgs.append(bg)
                    ks.append(k)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "bigram": pd.Series(bgs, dtype="object"),
                    "k": pd.array(ks, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kern, "id long, bigram string, k long"
    )


def bigram_lm_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-statistics quality score — the KenLM-style gibberish
    filter, INTEGERIZED so it is exact on every engine (the repo's
    no-libm rule: a log-probability would differ in the last ulp
    across math libraries; the rational sufficient statistics carry
    the same ranking signal):

    ``(id, n_bigrams, score_sum)`` where `n_bigrams` counts the doc's
    character bigrams (with repeats) and `score_sum` is the sum over
    those bigrams of the CORPUS-WIDE occurrence count. Rare/garbled
    character sequences drag `score_sum / n_bigrams` down; a consumer
    thresholds on that ratio (computed at the edge, or compare
    `score_sum * N > t * n_bigrams` in exact integers like e14).

    Scale shape: one kernel pass emits per-doc bigram counts (rows
    bounded by alphabet^2 per doc); corpus totals are one map-side-
    combinable aggregate over those counts; the totals table (a few
    hundred rows) broadcasts back. Characters never shuffle."""
    from pyspark.sql.functions import broadcast

    rows = bigram_rows(df, id_col=id_col, text_col=text_col)
    rows = rows.localCheckpoint(eager=False)
    totals = rows.groupBy("bigram").agg(F.sum("k").alias("c"))
    scored = (
        rows.join(broadcast(totals), "bigram")
        .groupBy("id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("c")).alias("score_sum"),
        )
    )
    base = df.select(F.col(id_col).cast("long").alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("score_sum", F.lit(0)).cast("long").alias("score_sum"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """Sparse lexical retrieval — BM25 with the RATIONAL idf
    (the t07 trade: ``(N - df + 0.5)/(df + 0.5) + 1`` instead of its
    log, a monotone per-term transform that keeps every value inside
    exact-rounded double arithmetic so an external SQL engine can
    replay scores bit-for-bit; libm log is not cross-engine stable).
    Returns ``(id, n_matched, score, rank)`` for documents matching
    at least one query term, ranked by (score desc, id).

    Okapi term saturation is standard: ``tf·(k1+1) / (tf + k1·(1 − b
    + b·dl/avgdl))``; ``avgdl`` is Σdl/N over the WHOLE corpus
    (empty/null docs count in N with dl 0). The cross-term sum folds
    in term-SORTED order (the v20 rule — float addition is
    order-sensitive), so ranks are deterministic everywhere.

    Scale shape (r13 optimization — guide §2.3/§2.4): NOTHING
    corpus-sized ever shuffles or materializes. Per-doc length `dl`
    is a narrow JVM projection (`size(array_remove(tokens, ''))`),
    so the corpus stats (N, Σdl) are ONE map-side-combinable
    aggregate job over the raw scan — the old shape exploded every
    token, localCheckpointed the token rows and shuffled them all
    through a groupBy just to count per-doc lengths, plus a separate
    count() job for N. The explode is now restricted to the
    broadcast query-term set before the only remaining shuffle (tf),
    and df derives from tf's group keys (distinct (id, term) == tf
    rows) instead of a second distinct pass over the tokens. Pair
    with `inverted_index` for a persisted posting-list layout, and
    fuse with dense kNN via `search.rrf_fuse` for hybrid retrieval.
    """
    from pyspark.sql.window import Window

    terms = sorted({str(t) for t in query_terms})
    toks = F.split(F.lower(F.trim(F.col(text_col))), "[\\t\\n\\f\\r ]+")
    # token count per ROW without exploding: split never yields nulls,
    # so dropping '' elements and taking size == the exploded
    # non-empty token count; null text -> 0 via an EXPLICIT null
    # guard (a bare coalesce(size(...), 0) would admit legacy
    # spark.sql.legacy.sizeOfNull=true's size(NULL) = -1 and skew
    # dl/avgdl — the old exploded shape had no such config
    # dependency, so neither may this one)
    dl_one = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.array_remove(toks, ""))
    )
    dl_expr = dl_one.alias("dl")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dl_one).alias("s"),
    ).first()
    n_docs = int(row["n"] or 0)
    total_toks = int(row["s"] or 0)
    avgdl = total_toks / n_docs if n_docs else 1.0

    ids = df.select(F.col(id_col).cast("long").alias("id"), dl_expr)
    # duplicate-id inputs: dl is the summed token count per id (the
    # exact semantics of the old exploded groupBy)
    dl = ids.groupBy("id").agg(F.sum("dl").alias("dl"))
    qx = (
        df.select(F.col(id_col).cast("long").alias("id"), toks.alias("_t"))
        .select("id", F.explode("_t").alias("term"))
        .where((F.col("term") != "") & F.col("term").isin(terms))
    )
    # lazy checkpoint: tf is tiny (matched docs x |terms|) and feeds
    # BOTH dfreq and the scored join — without it Catalyst plans the
    # tokenize+explode subtree twice (the dfreq branch canonicalizes
    # to a distinct, so exchange reuse can't kick in)
    tf = (
        qx.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    ) + F.lit(1.0)
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0)
        - F.lit(float(b))
        + F.lit(float(b)) * (F.col("dl") / F.lit(float(avgdl)))
    )
    contrib = idf * ((F.col("tf") * F.lit(float(k1) + 1.0)) / denom)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .withColumn("contrib", contrib)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    lambda s: s["contrib"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    if k is not None:
        # top-k FIRST via orderBy+limit (plans as a distributed
        # TakeOrdered — per-partition heaps, no single-partition
        # shuffle of every matched doc), THEN the rank window over
        # only k rows. A bare global row_number window would funnel
        # the whole matched set through one task at 100 TB.
        top = scored.orderBy(
            F.col("score").desc(), F.col("id").asc()
        ).limit(int(k))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "id", "n_matched", "score", "rank"
        )
    return scored.withColumn("rank", F.row_number().over(w)).select(
        "id", "n_matched", "score", "rank"
    )


def canonical_url(col) -> "F.Column":
    """URL canonicalization — the dedup PRE-step every crawl pipeline
    runs before any content hashing (one page, many URL spellings):

    1. strip the fragment (``#…``),
    2. split off the query string, drop tracking parameters
       (``utm_*``, ``fbclid``, ``gclid``, ``ref``), SORT the
       survivors (param order never distinguishes resources),
    3. lowercase the scheme+authority (host is case-insensitive;
       the path is NOT touched — it is case-sensitive by spec),
    4. drop the default ports ``:80``/``:443``,
    5. normalize an empty path to ``/``.

    Everything is LIKE / split / array_sort / regexp in the
    Java-regex ∩ RE2 ∩ python-re common subset (the t10 rule), so a
    DuckDB replay hash-matches (`canonical_url_sql`) — no
    parse_url(), which only Spark has. NOTE the LIKE-escape trap the
    SQL twin dodges: Spark LIKE escapes with backslash by DEFAULT,
    DuckDB only with an explicit ESCAPE clause. Malformed inputs
    degrade gracefully: no ``://`` means no authority step, the
    string still gets fragment/query handling."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, "#.*$", "")
    base = F.regexp_extract(no_frag, "^([^?]*)", 1)
    qs = F.regexp_extract(no_frag, "\\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~p.like("utm\\_%")
        & ~p.like("fbclid=%")
        & ~p.like("gclid=%")
        & ~p.like("ref=%"),
    )
    clean_qs = F.array_join(F.array_sort(params), "&")
    auth = F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    rest = F.when(
        auth != "", base.substr(F.length(auth) + 1, F.lit(1 << 30))
    ).otherwise(F.lit(""))
    auth_norm = F.regexp_replace(F.lower(auth), ":(80|443)$", "")
    path = F.when(
        auth != "",
        F.when(rest == "", F.lit("/")).otherwise(rest),
    ).otherwise(base)
    pre = F.when(auth != "", F.concat(auth_norm, path)).otherwise(path)
    return F.when(
        clean_qs != "", F.concat(pre, F.lit("?"), clean_qs)
    ).otherwise(pre)


def canonical_url_sql(expr: str) -> str:
    """DuckDB scalar replay of `canonical_url` (oracle side):
    identical step order; LIKE patterns carry an explicit ESCAPE
    (DuckDB has no default escape character, Spark does)."""
    nf = f"regexp_replace({expr}, '#.*$', '')"
    base = f"regexp_extract({nf}, '^([^?]*)', 1)"
    qs = f"regexp_extract({nf}, '\\?(.*)$', 1)"
    params = (
        f"list_filter(string_split({qs}, '&'), p -> p <> '' "
        f"AND p NOT LIKE 'utm\\_%' ESCAPE '\\' "
        "AND p NOT LIKE 'fbclid=%' AND p NOT LIKE 'gclid=%' "
        "AND p NOT LIKE 'ref=%')"
    )
    cqs = f"array_to_string(list_sort({params}), '&')"
    auth = f"regexp_extract({base}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)"
    rest = (
        f"(CASE WHEN {auth} <> '' THEN substr({base}, length({auth}) + 1) "
        "ELSE '' END)"
    )
    authn = f"regexp_replace(lower({auth}), ':(80|443)$', '')"
    path = (
        f"(CASE WHEN {auth} <> '' THEN "
        f"(CASE WHEN {rest} = '' THEN '/' ELSE {rest} END) "
        f"ELSE {base} END)"
    )
    pre = f"(CASE WHEN {auth} <> '' THEN {authn} || {path} ELSE {path} END)"
    return (
        f"(CASE WHEN {cqs} <> '' THEN {pre} || '?' || {cqs} ELSE {pre} END)"
    )


def hash_linear_score(
    df: DataFrame,
    weights: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: int = 18,
    include_bigrams: bool = True,
) -> DataFrame:
    """Hashed-feature linear text scorer — the fastText-style quality
    classifier shape every production pipeline runs at ingest:
    ``(id, n_feats, score)`` where features are the document's
    DISTINCT word unigrams (+ bigrams), each feature hashes into one
    of ``n_buckets`` buckets (the hashing trick), and the score is
    the sum of the buckets' weights over the feature set.

    ``weights``: a ``(bucket int, weight)`` table — YOUR trained
    model, broadcast-joined (at 100 TB the corpus-side plan is one
    tokenize + one hash-aggregate; the model is always
    broadcast-tiny). With ``weights=None`` the weights are seeded
    deterministically from the bucket id (integer in [-1000, 1000]
    via the salted h60) — the form the t18 gate pins, because it
    makes the ENTIRE pipeline (tokenize -> feature set -> hash ->
    bucket -> weight -> integer sum) exactly SQL-replayable; a
    trained model swaps in without touching the plan.

    Tokenization is the hardened explicit class ``[\\t\\n\\f\\r ]``
    (str.split/Java \\s/RE2 \\s disagree on \\x0B etc. — the t14
    rule); docs with no features (empty/null text) report
    ``n_feats = 0, score = 0`` rather than vanishing."""
    from vector_database_spark.functions.hashing import h60

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "[\\t\\n\\f\\r ]+"),
        lambda x: x != "",
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_t"),
    ).localCheckpoint(eager=False)
    uni = base.select("id", F.explode("_t").alias("feat"))
    feats = uni
    if include_bigrams:
        cnt = F.size("_t") - F.lit(1)
        idxs = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )
        big = base.select(
            "id",
            F.explode(
                F.transform(
                    idxs,
                    lambda i: F.concat(
                        F.element_at(F.col("_t"), i),
                        F.lit(" "),
                        F.element_at(F.col("_t"), i + 1),
                    ),
                )
            ).alias("feat"),
        )
        feats = feats.unionByName(big)
    fb = feats.distinct().withColumn(
        "bucket", F.pmod(h60("feat", salt), F.lit(int(n_buckets)))
    )
    if weights is not None:
        fb = fb.join(
            F.broadcast(
                weights.select(
                    F.col("bucket").cast("long").alias("bucket"), "weight"
                )
            ),
            "bucket",
            "left",
        ).withColumn("weight", F.coalesce(F.col("weight"), F.lit(0)))
    else:
        fb = fb.withColumn(
            "weight",
            (
                h60(
                    F.concat(F.lit("w:"), F.col("bucket").cast("string")),
                    salt,
                )
                % F.lit(2001)
                - F.lit(1000)
            ).cast("long"),
        )
    agg = fb.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum("weight").alias("score"),
    )
    # cast the score to long ONLY on the seeded path (integer by
    # construction); a user-supplied weights table may hold real
    # weights (the 'trained model swaps in' path) and a long cast
    # would silently truncate fractional scores — keep the sum's own
    # type there (coalesce coerces the 0 literal to it)
    score_out = F.coalesce("score", F.lit(0))
    if weights is None:
        score_out = score_out.cast("long")
    return (
        base.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            score_out.alias("score"),
        )
    )
