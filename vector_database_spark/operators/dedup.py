"""Deduplication operator family for training-data pipelines.

Five strategies, each designed scale-first:

* ``exact_dedup`` — hash-groupBy on a normalized key. One shuffle,
  map-side partial aggregation; the canonical 100 TB dedup.
* ``minhash_signatures`` + ``lsh_candidate_pairs`` + ``jaccard_pairs``
  — MinHash/LSH: shingle → k independent min-hashes → band buckets →
  bucket join. The candidate join is an equi-join on (band, key), so
  Spark shuffles only signature rows (#docs × #bands), never the
  cross product. All hashes are md5-derived (`functions.hashing`) so
  an external SQL oracle reproduces them bit-for-bit.
* ``simhash_signatures`` + ``simhash_pairs`` (banded equi-join by
  default; ``simhash_pairs_allpairs`` is the quadratic test oracle)
  — 60-bit SimHash over
  word shingles; near-dup = small Hamming distance.
* ``ngram_jaccard_pairs`` — exact Jaccard via an inverted-index
  self-join (pairs sharing ≥1 shingle), correct for any threshold
  t > 0 and never materializes the doc×doc cross product.
* ``embedding_neardup_pairs`` — cosine-similarity near-dups over an
  embedding column (brute pair join locally; the ANN module provides
  the bucketed scale path).

At 100 TB the shape that matters: every strategy is
shingle/signature-parallel (explode → equi-join → aggregate), no
driver-side state, no cross joins except where a threshold provably
bounds candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.hashing import h60
from vector_database_spark.functions.vector import cosine_similarity

SIMHASH_BITS = 60


def normalize_text(col) -> "F.Column":
    """Whitespace-collapsed, trimmed, lowercased text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def shingle_rows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    distinct: bool = True,
    impl: str = "arrow",
) -> DataFrame:
    """(id, shingle) rows: word n-grams.

    Two implementations with IDENTICAL output (exceptAll = 0 both
    ways at sf0.1; the whole shingle gate family hash-matches on
    either):

    * ``impl='arrow'`` (default): one `mapInPandas` pass — tokenize,
      shingle, and per-doc dedup inside the kernel. ZERO shuffles
      (the window form shuffles every token twice: the explode
      repartition-by-id sort, then the distinct). At 100 TB the
      no-shuffle property dominates; measured not-slower locally
      (0.39 s vs 0.45 s best-of-3 interleaved at sf0.1).
    * ``impl='window'``: posexplode + lead windows, all-JVM — no
      Python workers in the path, and the form whose expressions
      mirror the SQL oracle construction. Kept for JVM-only
      deployments and as the cross-engine reference.

    Both deliberately avoid array higher-order functions (transform/
    element_at lambdas), which Spark evaluates interpreted outside
    whole-stage codegen — measured ~8x slower on 5k docs.
    """
    if impl == "arrow":
        nsh = int(shingle_n)
        dedup_in_kernel = bool(distinct)

        def kern(batches):
            import pandas as pd

            for pdf in batches:
                ids: list = []
                outs: list = []
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    if t is None:  # expression path: split(NULL) -> no rows
                        continue
                    toks = t.lower().split()
                    grams = (
                        " ".join(toks[j : j + nsh])
                        for j in range(len(toks) - nsh + 1)
                    )
                    ss = set(grams) if dedup_in_kernel else list(grams)
                    ids.extend([i] * len(ss))
                    outs.extend(ss)
                yield pd.DataFrame(
                    {
                        "id": pd.array(ids, dtype="int64"),
                        "shingle": pd.Series(outs, dtype="object"),
                    }
                )

        return df.select(id_col, text_col).mapInPandas(
            kern, "id long, shingle string"
        )

    from pyspark.sql.window import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(w) for j in range(1, shingle_n)
    ]
    last = F.lead("tok", shingle_n - 1).over(w)
    sh = (
        ex.select(
            "id", F.concat_ws(" ", *parts).alias("shingle"), last.alias("_last")
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )
    return sh.distinct() if distinct else sh


def exact_dedup(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exactly-equal (normalized) texts: representative =
    min id, plus group size. One hash-aggregate shuffle."""
    return (
        df.select(F.col(id_col).alias("id"), normalize_text(text_col).alias("key"))
        .groupBy("key")
        .agg(
            F.min("id").alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, minhash: array<long>) — k independent md5-salted min-hashes
    over distinct word shingles. All JVM-side expression work.

    ``shingles``: optionally a precomputed ``(id, shingle)`` DataFrame
    (min() is duplicate-insensitive, so distinct or not both work) —
    lets a pipeline share ONE shingle pass between signatures and the
    exact-Jaccard refinement."""
    sh = shingles if shingles is not None else shingle_rows(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n, distinct=False
    )
    # ONE md5 per shingle; the k permutations are affine maps of it
    # (classic MinHash h_j(x) = (a_j*x + b_j) mod p). p = 2^31-1 keeps
    # a_j*x inside int64. Pure arithmetic — reproducible in any SQL.
    p = 2147483647
    base = (h60("shingle") % F.lit(p)).alias("hb")
    sh = sh.select("id", base)
    aggs = [
        F.min(
            (F.lit((1103515245 * (j + 1) + 12345) % p) * F.col("hb") + F.lit(j))
            % F.lit(p)
        ).alias(f"h{j}")
        for j in range(num_perm)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{j}") for j in range(num_perm)]).alias("minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, *, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the signatures and self-join on (band, band-key): docs
    agreeing on any band become a candidate pair ``(a_id, b_id)``.

    Shuffle volume is #docs × #bands rows — never quadratic. Skewed
    buckets (a degenerate band key shared by everything) are the known
    hazard at scale; AQE skew-join splitting handles moderate skew and
    a salt-and-recheck pass is the escape hatch beyond that.
    """
    banded = _band_signatures(
        signatures, bands=bands, rows_per_band=rows_per_band
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Refine candidate pairs with exact Jaccard over shingle sets:
    ``(a_id, b_id, jaccard)`` with jaccard >= threshold.

    Set algebra as joins over exploded (id, shingle) rows — the
    intersection count is an equi-join + count, never an
    array_intersect over materialized arrays (interpreted, O(|a|·|b|)
    per pair).

    ``shingles``: optionally a precomputed DISTINCT ``(id, shingle)``
    DataFrame (must be deduplicated — sizes and intersections count
    set elements)."""
    ex = (
        shingles
        if shingles is not None
        else shingle_rows(
            df, id_col=id_col, text_col=text_col, shingle_n=shingle_n
        ).persist()
    )
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = ex.select(F.col("id").alias("a_id"), "shingle")
    b = ex.select(F.col("id").alias("b_id"), "shingle")
    inter = (
        pairs.join(a, "a_id")
        .join(b, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("sz", "sa"), "a_id")
        .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("sz", "sb"), "b_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("inter")).cast("double"),
        )
    )
    return j.where(F.col("jaccard") >= F.lit(threshold)).select(
        "a_id", "b_id", "jaccard"
    )


def minhash_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    fused_signatures: bool = False,
) -> DataFrame:
    """The full MinHash-LSH dedup pipeline: signatures → band join →
    exact-Jaccard refinement. With J >= 0.5 pairs and 8×2 banding the
    miss probability is (1 - J²)^8 ≲ 1e-4, vanishing for the J ≳ 0.9
    near-dups dedup targets.

    One shared DISTINCT shingle pass feeds both the signature
    aggregation (min() is duplicate-insensitive) and the refinement's
    set algebra — the tokenize+window pass over the corpus runs once,
    not twice. Pass ``shingles`` (distinct, ideally persisted) to
    share that pass across operators too. ``fused_signatures=True``
    computes the signatures in the zero-shuffle Arrow kernel instead
    (bit-identical; see `minhash_signatures_fused`) — the right call
    when no other operator shares the shingle pass, since the
    refinement then only shingles what the corpus-wide signature
    shuffle would otherwise have paid for. Measured at sf0.1
    (interleaved best-of-3, full pipeline): expr 0.93 s vs fused
    1.37 s — the shared persisted shingle pass makes the expression
    aggregate marginal at this size, so expr stays the default; the
    crossover is where the (id, hash) shuffle dwarfs a second
    tokenize pass (corpus >> memory)."""
    sh = shingles if shingles is not None else shingle_rows(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n, distinct=True
    ).persist()
    if fused_signatures:
        sig = minhash_signatures_fused(
            df, id_col=id_col, text_col=text_col, num_perm=num_perm,
            shingle_n=shingle_n,
        )
    else:
        sig = minhash_signatures(
            df, id_col=id_col, text_col=text_col, num_perm=num_perm,
            shingle_n=shingle_n, shingles=sh,
        )
    cand = lsh_candidate_pairs(sig, bands=bands, rows_per_band=rows_per_band)
    return jaccard_pairs(
        df,
        cand,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        threshold=threshold,
        shingles=sh,
    )


def minhash_join(
    left_df: DataFrame,
    right_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus MinHash-LSH JOIN: for two document tables (e.g.
    an eval/benchmark set vs a training corpus), every cross pair
    whose shingle Jaccard >= ``threshold`` — ``(l_id, r_id,
    jaccard)``. The contamination-audit primitive at corpus scale:
    `minhash_dedup_pairs` is the SELF-join form; here the id spaces
    are unrelated so candidates come from an equi-join of the two
    banded signature tables on (band, key) — shuffle volume is
    (|L| + |R|) × bands rows, never |L| × |R| — and the exact-Jaccard
    refinement runs the same set-algebra joins across the two shingle
    passes. Signatures on both sides use the same salted affine
    permutations, so banding agrees by construction. Candidate recall
    follows the standard (1 − J^r)^b band bound; the refinement is
    exact on candidates, so output pairs are exact-above-threshold
    (the same contract as the self-join form, pytest-pinned equal to
    a brute cross-Jaccard on a small rig)."""
    lsh = shingle_rows(
        left_df, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        distinct=True,
    ).persist()
    rsh = shingle_rows(
        right_df, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        distinct=True,
    ).persist()
    lsig = minhash_signatures(
        left_df, id_col=id_col, text_col=text_col, num_perm=num_perm,
        shingle_n=shingle_n, shingles=lsh,
    )
    rsig = minhash_signatures(
        right_df, id_col=id_col, text_col=text_col, num_perm=num_perm,
        shingle_n=shingle_n, shingles=rsh,
    )
    lb = _band_signatures(lsig, bands=bands, rows_per_band=rows_per_band)
    rb = _band_signatures(rsig, bands=bands, rows_per_band=rows_per_band)
    cand = (
        lb.select(F.col("id").alias("l_id"), "band", "key")
        .join(rb.select(F.col("id").alias("r_id"), "band", "key"),
              ["band", "key"])
        .select("l_id", "r_id")
        .distinct()
    )
    lsz = lsh.groupBy("id").agg(F.count(F.lit(1)).alias("sl"))
    rsz = rsh.groupBy("id").agg(F.count(F.lit(1)).alias("sr"))
    inter = (
        cand.join(lsh.select(F.col("id").alias("l_id"), "shingle"), "l_id")
        .join(
            rsh.select(F.col("id").alias("r_id"), "shingle"),
            ["r_id", "shingle"],
        )
        .groupBy("l_id", "r_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            lsz.select(F.col("id").alias("l_id"), "sl"), "l_id"
        )
        .join(rsz.select(F.col("id").alias("r_id"), "sr"), "r_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sl") + F.col("sr") - F.col("inter")).cast("double"),
        )
    )
    return j.where(F.col("jaccard") >= F.lit(float(threshold))).select(
        "l_id", "r_id", "jaccard"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.3,
    max_shingle_df: int | None = 5000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted-index self-join.

    Any pair with J >= t > 0 shares at least one shingle, so joining
    on the shingle (then distinct) finds every qualifying pair without
    a cross join.

    ``max_shingle_df`` bounds the hot-shingle hazard: a stop-shingle
    appearing in ``f`` documents fans the self-join out to ``f²`` rows
    — one shingle shared by 10^6 docs would alone produce 10^12
    candidate rows. Shingles with document frequency above the cap are
    excluded from CANDIDATE GENERATION only (one extra small aggregate
    over the inverted index); the Jaccard itself is still computed
    over the full shingle sets, so reported similarities are exact.
    The approximation: a pair sharing ONLY above-cap shingles is not
    discovered. Such a pair consists of documents built almost
    entirely from ubiquitous shingles — at a df cap of 5000 this is a
    no-op below ~5k docs (every pair still shares a sub-cap shingle or
    shares nothing), and at corpus scale dropping stop-shingle-only
    matches is the standard inverted-index practice. ``None`` disables
    the cap (fully exact, quadratic-hazard accepted).
    """
    inv = shingles if shingles is not None else shingle_rows(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    )
    cand = _inverted_candidates(inv, max_shingle_df)
    return jaccard_pairs(
        df,
        cand,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        threshold=threshold,
        shingles=shingles,
    )


def _inverted_candidates(inv: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Unordered candidate pairs (a_id < b_id) from the inverted-index
    self-join, with the hot-shingle df cap — the ONE candidate
    generator `ngram_jaccard_pairs` and `containment_pairs` share
    (extracted so a cap/exactness fix can never drift between them)."""
    join_inv = inv
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > F.lit(int(max_shingle_df)))
            .select("shingle")
        )
        join_inv = inv.join(hot, "shingle", "left_anti")
    return (
        join_inv.alias("a")
        .join(join_inv.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 5000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """DIRECTED containment near-dup pairs: ``(src_id, dst_id,
    containment)`` with ``C(src→dst) = |S_src ∩ S_dst| / |S_src| ≥
    threshold`` — the asymmetric companion to d04's Jaccard. Jaccard
    misses subset duplication (a short doc fully quoted inside a long
    one scores |a|/|b| ≈ 0), which is exactly the quote/boilerplate-
    expansion case a training-data pipeline wants to catch;
    containment scores it 1.0 regardless of the size ratio.

    Same scale shape as `ngram_jaccard_pairs` (the candidate
    generator is literally shared — `_inverted_candidates`): any pair
    with C ≥ t > 0 shares a shingle, so candidates come from the
    inverted-index equi-join (same `max_shingle_df` hot-shingle cap,
    same exactness caveat), intersections are counted once per
    UNORDERED pair, and both directions are emitted from that single
    count divided by the respective source size. Output carries the
    EXACT integers (`inter`, `src_sz`) alongside the ratio — gates
    hash on the integers (the c01 round-tie rule: never emit a
    rounded ratio when its numerator/denominator are available).

    ``shingles=None`` builds the pass ad hoc WITHOUT persisting (the
    lineage is consumed by one result tree); pass a persisted
    `shingle_rows` frame to share the pass across operators."""
    inv = shingles if shingles is not None else shingle_rows(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    ).localCheckpoint(eager=False)
    cand = _inverted_candidates(inv, max_shingle_df)
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = inv.select(F.col("id").alias("a_id"), "shingle")
    b = inv.select(F.col("id").alias("b_id"), "shingle")
    inter = (
        cand.join(a, "a_id")
        .join(b, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            sizes.withColumnRenamed("id", "a_id").withColumnRenamed("sz", "sa"),
            "a_id",
        )
        .join(
            sizes.withColumnRenamed("id", "b_id").withColumnRenamed("sz", "sb"),
            "b_id",
        )
    )
    both = j.select(
        F.col("a_id").alias("src_id"),
        F.col("b_id").alias("dst_id"),
        F.col("inter").cast("long").alias("inter"),
        F.col("sa").cast("long").alias("src_sz"),
        (F.col("inter").cast("double") / F.col("sa").cast("double")).alias(
            "containment"
        ),
    ).unionByName(
        j.select(
            F.col("b_id").alias("src_id"),
            F.col("a_id").alias("dst_id"),
            F.col("inter").cast("long").alias("inter"),
            F.col("sb").cast("long").alias("src_sz"),
            (F.col("inter").cast("double") / F.col("sb").cast("double")).alias(
                "containment"
            ),
        )
    )
    return both.where(F.col("containment") >= F.lit(float(threshold)))


# SWAR lane geometry for the packed simhash aggregate: 3 bit-counters
# of 20 bits per long. A lane overflows only past 2^20 distinct
# shingles in ONE document (~a 4 MB single doc) — beyond the operating
# envelope of per-doc shingle sets generally.
_SIMHASH_LANE_BITS = 20
_SIMHASH_LANES = 3


def simhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """60-bit SimHash over word shingles: ``(id, simhash: long)``.

    bit_b(doc) = 1 iff Σ_features (±1 by feature-hash bit b) > 0,
    equivalently 2·(count of features with bit b set) > count — so the
    per-bit counters pack SWAR-style into 20-bit lanes, 3 per long:
    ONE codegen projection spreads each feature hash into 20 packed
    longs and the groupBy sums 21 longs (20 packs + count) instead of
    60 conditional ±1 aggregates (the round-2 shape — 3× the aggregate
    buffer width and 60 branchy update expressions per row). Output is
    bit-identical; a single shuffle regardless of bit width.

    ``shingles``: optionally a precomputed DISTINCT ``(id, shingle)``
    DataFrame to share one tokenize+window pass across operators.
    """
    sh = shingles if shingles is not None else shingle_rows(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    )
    feats = sh.withColumn("h", h60("shingle"))
    n_longs = (SIMHASH_BITS + _SIMHASH_LANES - 1) // _SIMHASH_LANES
    packs = []
    for g in range(n_longs):
        terms = None
        for lane in range(_SIMHASH_LANES):
            b = g * _SIMHASH_LANES + lane
            if b >= SIMHASH_BITS:
                break
            t = F.shiftleft(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)),
                lane * _SIMHASH_LANE_BITS,
            )
            terms = t if terms is None else terms + t
        packs.append(terms.alias(f"p{g}"))
    packed = feats.select("id", *packs)
    sums = packed.groupBy("id").agg(
        *[F.sum(f"p{g}").alias(f"p{g}") for g in range(n_longs)],
        F.count(F.lit(1)).alias("cnt"),
    )
    sim = None
    for g in range(n_longs):
        for lane in range(_SIMHASH_LANES):
            b = g * _SIMHASH_LANES + lane
            if b >= SIMHASH_BITS:
                break
            sb = F.shiftright(F.col(f"p{g}"), lane * _SIMHASH_LANE_BITS).bitwiseAND(
                F.lit((1 << _SIMHASH_LANE_BITS) - 1)
            )
            # s_b = 2·ones_b − cnt > 0  ⇔  2·ones_b > cnt (ties → 0)
            bit = F.when(sb * 2 > F.col("cnt"), F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, b)
            sim = term if sim is None else sim + term
    return sums.select("id", sim.alias("simhash"))


def simhash_pairs_allpairs(
    signatures: DataFrame, *, max_hamming: int = 6
) -> DataFrame:
    """Quadratic all-pairs form of `simhash_pairs` — a crossJoin kept
    ONLY as the independent oracle for tests and tiny corpora. The
    undecorated `simhash_pairs` name is the banded equi-join (the
    plan that survives 100 TB); reach for this one deliberately."""
    a = signatures.select(
        F.col("id").alias("a_id"), F.col("simhash").alias("ha")
    )
    b = signatures.select(
        F.col("id").alias("b_id"), F.col("simhash").alias("hb")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def simhash_pairs(
    signatures: DataFrame, *, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by Hamming distance between simhashes — the
    DEFAULT is the scale-safe equi-join: block on bit-bands of the
    simhash (split the 60 bits into max_hamming+1 chunks — any pair
    within the Hamming budget agrees exactly on ≥1 chunk, pigeonhole),
    join on (chunk, key), then filter on exact Hamming distance.
    Identical results to the all-pairs form
    (`simhash_pairs_allpairs`, the quadratic test oracle), but the
    join never materializes the n² candidate space."""
    chunks = max_hamming + 1
    width = SIMHASH_BITS // chunks + (1 if SIMHASH_BITS % chunks else 0)
    keys = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for c in range(chunks)
        ]
    )
    blocked = signatures.select(
        "id", "simhash", F.explode(keys).alias("ck")
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["chunk", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# Backwards-compatible name: the banded equi-join IS the default now.
simhash_pairs_banded = simhash_pairs


def _cc_star(sym: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14) over a symmetric edge frame: returns ``(u, component)``
    for every paired node, component = min id of its component.

    Edge-set rewrite per round, both halves pure equi-join + groupBy:
    - LARGE-STAR: per node u with neighborhood Γ(u), m = min(Γ∪{u});
      every strictly LARGER neighbor re-points at m: emit (v, m) for
      v ∈ Γ(u), v > u. Processed from the symmetric view, so each
      undirected edge is handled once, from its smaller endpoint.
    - SMALL-STAR: edges now all point big→small; per big endpoint u,
      m = min of its small neighbors; u and every non-min neighbor
      re-point at m.
    Connectivity is invariant and every edge's small endpoint at
    least halves its distance-to-min per round pair — O(log d)
    rounds on a diameter-d graph (the paper's potential argument),
    vs d rounds for min-label propagation. Emissions can never be
    self-edges (the emitted target is strictly smaller). Fixpoint =
    a forest of stars rooted at component minima; detected as an
    unchanged edge set (count + one-way exceptAll). Each round's
    edge set is eagerly checkpointed — the set is REWRITTEN every
    round, so lineage would otherwise stack log-d shuffles deep."""
    # normalize column ORDER: callers hand sym through semi-joins that
    # move the join key first, and positional unions would silently
    # swap endpoints (measured: false 2-round "convergence")
    E = (
        sym.select("u", "v")
        .where(F.col("u") > F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = E.count()
    rounds = 0
    converged = False
    for it in range(int(max_iter)):
        s = E.unionByName(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nm = s.groupBy("u").agg(F.min("v").alias("mn"))
        lg = (
            s.join(nm, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"),
            )
            .distinct()
        )
        sm_min = lg.groupBy("u").agg(F.min("v").alias("m"))
        joined = lg.join(sm_min, "u")
        E_new = (
            joined.select("u", F.col("m").alias("v"))
            .unionByName(
                joined.where(F.col("v") != F.col("m")).select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds = it + 1
        n_new = E_new.count()
        if n_new == n_prev and E_new.exceptAll(E).limit(1).count() == 0:
            E = E_new
            converged = True
            break
        E, n_prev = E_new, n_new
    connected_components._last_rounds = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components(star): no fixpoint after {max_iter} "
            "rounds; raise max_iter"
        )
    roots = (
        E.select(F.col("v").alias("u"))
        .distinct()
        .withColumn("component", F.col("u"))
    )
    return (
        E.select("u", F.col("v").alias("component"))
        .unionByName(roots)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    *,
    id_col: str = "id",
    max_iter: int = 50,
    checkpoint_every: int = 4,
    method: str = "minlabel",
) -> DataFrame:
    """Connected components over an undirected pair graph:
    ``(id, component)`` where component = min node id reachable.

    ``method='minlabel'`` (default, the oracle path): min-label
    propagation with a driver-side fixpoint loop — each round every
    node takes the minimum label over itself and its neighbors, one
    equi-join + one groupBy per round, both map-side combinable.
    Rounds needed = graph DIAMETER. Duplicate-document graphs are
    near-cliques (every copy pairs with every other), so diameter ≈ 2
    and the loop exits in 2-3 rounds; lineage is cut with eager
    localCheckpoints so long chains cannot blow up the analyzer
    (same discipline as the index-build loop).

    ``method='star'`` (the adversarial-input scale path, round-6
    verdict item 2): alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — every round REWRITES the edge set to point closer to
    the component minimum, so a chain of diameter d converges in
    O(log d) rounds instead of d (asserted on a 10k chain in
    tests/test_property_dedup.py; crawl-data boilerplate chains are
    exactly this shape). Identical output to minlabel on any graph —
    components are canonical. The round count is recorded on
    ``connected_components._last_rounds`` (test/telemetry hook).

    Capability analog of the reference's tree *consolidation* walk
    (MemoryVectorIndex.cs:462-486) re-expressed as a set-based
    fixpoint, the same inversion SURVEY §4 applies to the build.
    """
    if method not in ("minlabel", "star"):
        raise ValueError(f"method must be minlabel|star, got {method!r}")
    node_ids = nodes.select(F.col(id_col).alias("u")).distinct()
    sym = pairs.select(
        F.col("a_id").alias("u"), F.col("b_id").alias("v")
    ).unionAll(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
    # contract: components are defined over `nodes` — edges touching
    # ids absent from `nodes` neither relay connectivity nor donate
    # labels (a filtered node subset must not merge through, or be
    # labeled by, a non-existent node)
    sym = (
        sym.join(node_ids, "u", "left_semi")
        .join(node_ids.withColumnRenamed("u", "v"), "v", "left_semi")
    )
    sym = sym.localCheckpoint(eager=True)
    # Propagate over the PAIRED subgraph only: a node with no pair has
    # no neighbors and can never change its label, so shuffling the
    # full corpus every round is pure waste — at 100 TB the near-dup
    # subgraph is typically a small fraction of the node set, and this
    # keeps each round's join/agg proportional to |pairs|, not |docs|.
    # Singletons rejoin (component = own id) once, after the fixpoint.
    if method == "star":
        # checkpoint_every intentionally NOT passed: the star path
        # rewrites its whole edge set every round, so every round
        # must checkpoint (lineage would stack log-d shuffles deep).
        labels = _cc_star(sym, max_iter)
        return (
            nodes.select(F.col(id_col).alias("u"))
            .join(labels, "u", "left")
            .select(
                F.col("u").alias(id_col),
                F.coalesce("component", F.col("u")).alias("component"),
            )
        )
    labels = (
        sym.select("u").distinct().withColumn("component", F.col("u"))
    )
    labels = labels.localCheckpoint(eager=True)
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausting max_iter without a fixpoint means labels are WRONG
        # (some component still carries multiple labels) — never return
        # silently-corrupt groups (graph diameter > max_iter, e.g. a
        # pathological chain); raise so the caller can re-run with a
        # higher budget or the large-star/small-star variant.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return (
        nodes.select(F.col(id_col).alias("u"))
        .join(labels, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce("component", F.col("u")).alias("component"),
        )
    )


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    cc_method: str = "minlabel",
) -> DataFrame:
    """The dedup *endpoint* a training pipeline actually consumes:
    per-document group assignment with a deterministic canonical
    representative (the min doc id of the component) —
    ``(doc_id, group_id, group_size, is_canonical)``.

    Singletons (no near-dup pair) form their own group. Downstream
    "keep one per group" is then `where is_canonical = 1` — a filter,
    not another shuffle.
    """
    nodes = df.select(F.col(id_col).alias("id"))
    comp = connected_components(pairs, nodes, method=cc_method)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("group_id"),
            "group_size",
            F.when(F.col("id") == F.col("component"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_canonical"),
        )
    )


# target cells (rows x dims) per block of the exact near-dup pair
# kernel: bounds both the per-task matrices and the BLAS tile size.
_NEARDUP_BLOCK_CELLS = 2_000_000


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ``(a_id, b_id, cos_sim)`` —
    EXACT all-pairs, fully distributed (no driver materialization).

    Block-pair decomposition: each row lands in one of B blocks by id
    hash; a codegen'd literal array + ``posexplode`` replicates every
    row to the B block-pairs it participates in (pair (i, j), i <= j,
    holds block i rows as side 0 and block j rows as side 1), so each
    unordered row pair meets in EXACTLY one ``applyInPandas`` group.
    The kernel computes chunked ``A @ B.T`` with BLAS; survivors of an
    epsilon-guarded prefilter are recomputed with an exact sequential
    fold so reported similarities are bit-identical to the ANSI-SQL
    oracle formula (BLAS reorders summation).

    Shuffle volume is rows x B — quadratic work (inherent to exact
    all-pairs) but never quadratic shuffle, and driver traffic is zero
    (the round-1 version ``collect()``-ed the whole table). For
    approximate near-dup at extreme scale use `ann.rp_lsh_codes` /
    IVF-cell blocking in front of the same kernel (a02's path).
    """
    side = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    if n_blocks is None:
        first = side.select(F.size("v").alias("d")).first()
        dims = int(first["d"]) if first and first["d"] is not None else 1
        n_rows = side.count()
        block_rows = max(1024, _NEARDUP_BLOCK_CELLS // max(1, dims))
        n_blocks = max(1, -(-n_rows // block_rows))
    B = int(n_blocks)
    thr = float(threshold)

    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
    # literal pair list per block value: codegen'd array, no HOF lambda
    pairs = F.array(
        *[
            F.struct(
                (F.least(blk, F.lit(q)) * B + F.greatest(blk, F.lit(q))).alias(
                    "pk"
                ),
                F.when(blk <= F.lit(q), F.lit(0)).otherwise(F.lit(1)).alias("side"),
            )
            for q in range(B)
        ]
    )
    # every row appears exactly B times, once per distinct block pair
    tagged = side.select("id", "v", F.explode(pairs).alias("p")).select(
        "id", "v", F.col("p.pk").alias("pk"), F.col("p.side").alias("side")
    )

    def make_kernel(threshold_val: float):
        def kernel(pdf):
            import math

            import numpy as np
            import pandas as pd

            a_pdf = pdf[pdf["side"] == 0]
            b_pdf = pdf[pdf["side"] == 1]
            self_pair = len(b_pdf) == 0
            a_ids = a_pdf["id"].to_numpy(dtype=np.int64)
            a_mat = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in a_pdf["v"]], dtype=np.float64
            )
            if len(b_pdf):
                b_ids = b_pdf["id"].to_numpy(dtype=np.int64)
                b_mat = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in b_pdf["v"]],
                    dtype=np.float64,
                )
            else:  # self block-pair (i == i): compare A against itself
                b_ids, b_mat = a_ids, a_mat
            out_a: list = []
            out_b: list = []
            out_s: list = []
            if len(a_ids) and len(b_ids):
                a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
                b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
                chunk = 1024
                for c0 in range(0, len(a_ids), chunk):
                    c1 = min(c0 + chunk, len(a_ids))
                    sims = (a_mat[c0:c1] @ b_mat.T) / np.outer(
                        a_norms[c0:c1], b_norms
                    )
                    ai, bi = np.nonzero(sims >= threshold_val - 1e-9)
                    for i, j in zip(ai, bi):
                        ia, ib = int(a_ids[c0 + i]), int(b_ids[j])
                        if self_pair:
                            # self matrix covers both orders: keep one
                            if ia >= ib:
                                continue
                        elif ia > ib:
                            # cross pair appears once; canonicalize
                            ia, ib = ib, ia
                        va, vb = a_mat[c0 + i], b_mat[j]
                        d = na = nb = 0.0
                        for x, y in zip(va, vb):
                            d += x * y
                            na += x * x
                            nb += y * y
                        s = d / (math.sqrt(na) * math.sqrt(nb))
                        if s >= threshold_val:
                            out_a.append(ia)
                            out_b.append(ib)
                            out_s.append(s)
            return pd.DataFrame(
                {
                    "a_id": pd.array(out_a, dtype="int64"),
                    "b_id": pd.array(out_b, dtype="int64"),
                    "cos_sim": pd.array(out_s, dtype="float64"),
                }
            )

        return kernel

    return tagged.groupBy("pk").applyInPandas(
        make_kernel(thr), "a_id long, b_id long, cos_sim double"
    )


def contamination_overlap(
    train_shingles: DataFrame,
    bench_shingles: DataFrame,
    *,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    distinct shingles appear anywhere in the benchmark/eval set.

    Input: (id, shingle) rows (from `shingle_rows`) for both sides.
    Output: (id, n_shingles, n_overlap) — callers derive flags/
    fractions. The benchmark side is reduced to DISTINCT shingles and
    (by default) broadcast — eval suites are tiny next to a 100 TB
    corpus, so the training table is scanned once with a broadcast
    hash join and never shuffles. Set ``broadcast_bench=False`` for a
    benchmark too large to broadcast (falls back to a shuffle
    equi-join on the shingle)."""
    bench = bench_shingles.select("shingle").distinct()
    if broadcast_bench:
        bench = F.broadcast(bench)
    hit = bench.withColumn("_hit", F.lit(1))
    return (
        train_shingles.join(hit, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
    )


def boilerplate_stats(
    shingles: DataFrame,
    *,
    min_docs: int = 3,
) -> DataFrame:
    """Repeated-passage (boilerplate) detection: a shingle occurring in
    ``min_docs``+ DISTINCT documents is boilerplate (headers, footers,
    license blocks, templated spans); per document, report how much of
    it is boilerplate.

    Input: DISTINCT (id, shingle) rows. Output: (id, n_shingles,
    n_boiler). Two hash aggregates + one equi-join, all map-side
    combinable; the hot-shingle table is usually small enough that AQE
    broadcasts the join at runtime. This is the cheap cross-doc
    complement to pairwise near-dup: it catches spans repeated across
    THOUSANDS of docs that pairwise Jaccard thresholds miss."""
    hot = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .where(F.col("_docs") >= int(min_docs))
        .select("shingle")
        .withColumn("_hot", F.lit(1))
    )
    return (
        shingles.join(hot, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hot").alias("n_boiler"),
        )
    )


def embedding_neardup_blocked(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style APPROXIMATE embedding near-dup: cluster the
    corpus into IVF cells (bounded-sample Lloyd + one BLAS assignment
    pass, `ann.ivf_build`), then run the exact all-pairs kernel WITHIN
    each cell only. Returns ``(a_id, b_id, cos_sim)`` like the exact
    `embedding_neardup_pairs`.

    This is the 100 TB operating point for embedding dedup (Abbas et
    al., "SemDeDup", 2023): near-duplicates are by definition close in
    embedding space, so with enough cells almost every true pair lands
    in one cell and pair work drops from O(n²) to Σ|cell|² — with
    n_cells sized so cells hold ~1/√(work budget) rows, a 1000×
    corpus growth is absorbed by growing n_cells, not pair work.
    Cross-cell pairs are missed BY DESIGN (the gate self-asserts
    measured recall against the exact operator); raise n_cells for
    finer blocking or run the exact block-pair variant when recall
    must be 1. Reported similarities for found pairs are exact-fold
    recomputed — bit-identical to the exact operator's values.

    CLONE PILES: a cell of g bit-identical vectors emits all g·(g−1)
    pairs — that's the OUTPUT (every clone pair IS a near-dup pair),
    not avoidable work, so the quadratic blow-up on clone-heavy
    corpora is inherent to the pair contract. Run `exact_dedup`
    FIRST (the `pipeline.prepare_training_data` stage order) so only
    one representative per clone group reaches this operator; the
    kNN-graph family, whose per-node output is bounded by k, instead
    collapses clones internally (`graph._collapse_dup_vectors`).
    """
    from vector_database_spark.operators.ann import ivf_build

    vecs = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    assigned, _cents = ivf_build(
        vecs, id_col="id", vector_col="v", n_cells=n_cells, iters=iters,
        seed=seed,
    )
    return neardup_within_cells(assigned, threshold=threshold)


def neardup_within_cells(
    assigned: DataFrame, *, threshold: float = 0.95
) -> DataFrame:
    """The SemDeDup pair stage on an EXTERNALLY cell-assigned frame
    ``(id, vector, cell)``: exact all-pairs cosine within each cell
    (chunked BLAS prefilter + sequential-fold exact recompute, so
    reported similarities and the threshold decision are bit-identical
    to the exact operator and SQL-replayable). Use with
    `ann.ivf_assign_expr` over deterministic centroids for a fully
    oracle-checkable blocked near-dup (d08), or let
    `embedding_neardup_blocked` train cells for the scale path."""
    thr = float(threshold)

    def make_cell_kernel(threshold_val: float):
        def kernel(pdf):
            import math

            import numpy as np
            import pandas as pd

            ids = pdf["id"].to_numpy(dtype=np.int64)
            out_a: list = []
            out_b: list = []
            out_s: list = []
            if len(ids) > 1:
                mat = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["vector"]],
                    dtype=np.float64,
                )
                norms = np.sqrt((mat * mat).sum(axis=1))
                chunk = 1024
                for c0 in range(0, len(ids), chunk):
                    c1 = min(c0 + chunk, len(ids))
                    sims = (mat[c0:c1] @ mat.T) / np.outer(
                        norms[c0:c1], norms
                    )
                    ai, bi = np.nonzero(sims >= threshold_val - 1e-9)
                    for i, j in zip(ai, bi):
                        ia, ib = int(ids[c0 + i]), int(ids[j])
                        if ia >= ib:  # self matrix covers both orders
                            continue
                        va, vb = mat[c0 + i], mat[j]
                        d = na = nb = 0.0
                        for x, y in zip(va, vb):
                            d += x * y
                            na += x * x
                            nb += y * y
                        s = d / (math.sqrt(na) * math.sqrt(nb))
                        if s >= threshold_val:
                            out_a.append(ia)
                            out_b.append(ib)
                            out_s.append(s)
            return pd.DataFrame(
                {
                    "a_id": pd.array(out_a, dtype="int64"),
                    "b_id": pd.array(out_b, dtype="int64"),
                    "cos_sim": pd.array(out_s, dtype="float64"),
                }
            )

        return kernel

    return assigned.groupBy("cell").applyInPandas(
        make_cell_kernel(thr), "a_id long, b_id long, cos_sim double"
    )


def minhash_signatures_fused(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, minhash) in ONE Arrow pass: tokenize, shingle, md5-hash
    and take the k affine-permutation minima per document INSIDE the
    kernel — ZERO shuffles. The expression path
    (`minhash_signatures`) explodes to (id, shingle-hash) rows and
    shuffles them all into a 16-min groupBy; at 100 TB that shuffle
    is corpus-sized while this kernel's output is one row per doc.

    Output is BIT-IDENTICAL to the expression path (same md5[18:15]
    base hash, same affine maps mod 2^31-1, min over the same
    distinct shingle sets; docs with no shingles emit no row) —
    asserted by test and interchangeable under the d02 oracle.
    """
    p = 2147483647
    nperm, nsh = int(num_perm), int(shingle_n)
    a_consts = [(1103515245 * (j + 1) + 12345) % p for j in range(nperm)]

    def kern(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        A = np.asarray(a_consts, dtype=np.int64)
        J = np.arange(nperm, dtype=np.int64)
        for pdf in batches:
            ids: list = []
            sigs: list = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:  # expression path: NULL text -> no rows
                    continue
                toks = t.lower().split()
                ss = {
                    " ".join(toks[j : j + nsh])
                    for j in range(len(toks) - nsh + 1)
                }
                if not ss:
                    continue  # expression path emits no row either
                hb = np.fromiter(
                    (
                        int(
                            hashlib.md5(s.encode("utf-8")).hexdigest()[17:32],
                            16,
                        )
                        % p
                        for s in ss
                    ),
                    dtype=np.int64,
                    count=len(ss),
                )
                mins = ((hb[:, None] * A[None, :] + J[None, :]) % p).min(
                    axis=0
                )
                ids.append(i)
                sigs.append(mins.tolist())
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    # explicit object dtype: an empty plain-list column
                    # defaults to float64, which Arrow cannot convert
                    # to list<int64> (empty batches crash otherwise)
                    "minhash": pd.Series(sigs, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kern, "id long, minhash array<long>"
    )


def _band_signatures(
    signatures: DataFrame, *, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, key) rows from (id, minhash) signatures."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col("minhash")[b * rows_per_band + r]
                        for r in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def incremental_neardup(
    new_docs: DataFrame,
    corpus_signatures: DataFrame,
    corpus_shingles: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
    include_new_pairs: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Ingest-time near-dup detection: check a NEW batch of documents
    against an EXISTING corpus without touching corpus state —
    signatures for the new batch only (zero-shuffle fused kernel), a
    banded equi-join against the persisted corpus signature table,
    exact-Jaccard refinement over the union of shingle rows.

    Returns ``(pairs, new_signatures, new_shingles)`` — pairs is
    (a_id, b_id, jaccard), canonically ordered a_id < b_id; the
    caller appends new_signatures /
    new_shingles to the corpus state tables (parquet append at scale)
    so the next batch checks against the grown corpus. Shuffle per
    batch: batch×bands signature rows + the candidates' shingles —
    the corpus shingle table is semi-joined to the candidate ids
    before any aggregate, so refinement cost tracks the candidate
    set, not the corpus.

    Ids already present in ``corpus_signatures`` are DROPPED from the
    batch (an id re-ingest would duplicate its shingle rows in the
    union and silently corrupt every Jaccard touching it — sizes and
    intersections would double); re-ingesting changed content under
    the same id is an upsert, which this append-only flow does not
    model.

    ``include_new_pairs``: also detect near-dups WITHIN the batch
    (exact same banding; one extra small self-join).
    """
    new_docs = new_docs.join(
        corpus_signatures.select(F.col("id").alias(id_col)),
        id_col,
        "left_anti",
    )
    new_sigs = minhash_signatures_fused(
        new_docs, id_col=id_col, text_col=text_col, num_perm=num_perm,
        shingle_n=shingle_n,
    )
    new_sh = shingle_rows(
        new_docs, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        distinct=True,
    )
    bn = _band_signatures(new_sigs, bands=bands, rows_per_band=rows_per_band)
    bc = _band_signatures(
        corpus_signatures, bands=bands, rows_per_band=rows_per_band
    )
    cross = (
        bc.alias("a")
        .join(bn.alias("b"), ["band", "key"])
        .where(F.col("a.id") != F.col("b.id"))
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("a_id"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("b_id"),
        )
        .distinct()
    )
    cand = cross
    if include_new_pairs:
        within = lsh_candidate_pairs(
            new_sigs, bands=bands, rows_per_band=rows_per_band
        )
        cand = cross.unionByName(within).distinct()
    # refinement reads only the CANDIDATES' shingles: semi-join the
    # (growing) corpus shingle table down to candidate ids before the
    # size/intersection aggregates — per-batch cost stays proportional
    # to the candidate set, never the corpus
    cand_ids = (
        cand.select(F.col("a_id").alias("id"))
        .unionByName(cand.select(F.col("b_id").alias("id")))
        .distinct()
    )
    all_sh = corpus_shingles.unionByName(new_sh).join(
        cand_ids, "id", "left_semi"
    )
    pairs = jaccard_pairs(
        new_docs, cand, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, threshold=threshold, shingles=all_sh,
    )
    return pairs, new_sigs, new_sh


def plan_minhash_bands(
    threshold: float,
    num_perm: int,
    *,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Choose the (bands, rows) split of ``num_perm`` MinHash values
    that best matches a target Jaccard ``threshold`` — the standard
    S-curve calibration (Leskovec/Rajaraman/Ullman, MMDS ch.3): a
    pair with similarity s collides in ≥1 band with probability
    1 − (1 − s^rows)^bands, and the integrals of that curve below
    (false positives) / above (false negatives) the threshold are
    minimized over all exact divisors b·r = num_perm. Weights skew
    the trade (dedup pipelines usually prefer recall: lower
    ``fn_weight`` tolerance ⇒ raise ``fn_weight``). Pure driver-side
    math — feed the result to `lsh_candidate_pairs(bands=...)`."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    n = int(num_perm)
    best: tuple[float, int, int] | None = None
    steps = 1000
    for b in range(1, n + 1):
        if n % b:
            continue
        r = n // b
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = float(fp_weight) * fp + float(fn_weight) * fn
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def tfidf_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_term_df: int | None = None,
) -> DataFrame:
    """SPARSE cosine near-dup — the lexical complement of the dense
    embedding path (d05/d08): documents as tf-idf vectors over
    whitespace terms, pairs by inverted-index join (docs sharing ≥1
    term — never the doc×doc product), cosine over the SHARED terms'
    weight products. Returns ``(a_id, b_id, n_shared, cos_sim)`` for
    pairs with cos ≥ threshold.

    Exact and SQL-replayable end-to-end: weights are the rational
    tf-idf (tf/len × (N+1)/(df+1) — t07's no-log form), per-doc norms
    and per-pair dots fold in TERM-SORTED order (the v20 rule), and
    cos = dot/(na·nb) is a fixed chain of exact-rounded double ops —
    the d12 gate hash-matches unrounded.

    ``max_term_df`` caps which terms GENERATE candidates (stop-words
    pair everything with everything — the d04 hazard); capped runs
    still compute the FULL dot for every generated pair, so reported
    similarities never change, only which pairs get scored (the
    documented candidate contract, same as `containment_pairs`)."""
    from pyspark.sql.window import Window  # noqa: F401  (parity w/ siblings)

    # Explicit whitespace class: Java \s, RE2 \s and python \s disagree
    # on \x0B / \x1c-\x1f, so the oracle replay must tokenize with the
    # same common subset (the t14/t15/p08 hardening rule).
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"[\t\n\f\r ]+")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    tf = ex.groupBy("id", "term").agg(F.count(F.lit(1)).alias("c"))
    doc_len = tf.groupBy("id").agg(F.sum("c").alias("n_toks"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    w = (
        tf.join(doc_len, "id")
        .join(doc_freq, "term")
        .select(
            "id",
            "term",
            "df",
            (
                (F.col("c") / F.col("n_toks"))
                * (F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)))
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    # per-doc norm: term-sorted fold of w^2 (deterministic), then sqrt
    norms = (
        w.groupBy("id")
        .agg(
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("term", "w"))),
                        lambda s: s["w"] * s["w"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("norm")
        )
    )
    cand_w = w if max_term_df is None else w.where(
        F.col("df") <= int(max_term_df)
    )
    a = cand_w.select(
        F.col("id").alias("a_id"), "term"
    )
    b = cand_w.select(F.col("id").alias("b_id"), "term")
    cand = (
        a.join(b, "term")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    wa = w.select(F.col("id").alias("a_id"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col("id").alias("b_id"), "term", F.col("w").alias("wb"))
    shared = cand.join(wa, "a_id").join(wb, ["b_id", "term"])
    dots = shared.groupBy("a_id", "b_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("term"),
                            (F.col("wa") * F.col("wb")).alias("p"),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    na = norms.select(F.col("id").alias("a_id"), F.col("norm").alias("na"))
    nb = norms.select(F.col("id").alias("b_id"), F.col("norm").alias("nb"))
    out = (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
    )
    return out.where(F.col("cos_sim") >= F.lit(float(threshold)))
