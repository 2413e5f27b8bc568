"""End-to-end prep funnel: every stage's effect is observable on a
crafted corpus, and the JSONL export round-trips."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_database_spark.pipeline import prepare_training_data

# distinct bodies per group so only the INTENDED pairs are near-dups
# (a shared long prefix would glue every doc into one LSH component)
_B0 = ("the quick brown fox jumps over the lazy dog near a quiet "
       "river in the morning light")
_B1 = ("a tall ship sails on the open sea with the wind and many "
       "bright stars to guide her crew at night")
_B3 = _B1.replace("crew", "captain")  # near-dup of _B1
_B6 = ("please send the signed forms to our office and write to me "
       "at bob@corp.example.com before the end of this week")
_EVAL = ("a silver comet streaks across the dark night sky while "
         "children watch in wonder from the top of a windy hill")


def _corpus(spark):
    rows = [
        # survivors: good quality, distinct
        (0, _B0, "src0"),
        (1, _B1, "src0"),
        # exact dup of 0 -> dropped at stage 3
        (2, _B0, "src0"),
        # near-dup of 1 (one word changed) -> dropped at stage 4
        (3, _B3, "src0"),
        # junk quality (too short) -> dropped at stage 1
        (4, "tiny", "src1"),
        # contaminated: equals the eval doc -> dropped at stage 2
        (5, _EVAL, "src1"),
        # survivor with PII -> scrubbed at stage 5
        (6, _B6, "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_prepare_training_data_funnel(spark):
    docs = _corpus(spark)
    eval_docs = spark.createDataFrame(
        [(100, _EVAL)], "doc_id long, text string"
    )
    d = tempfile.mkdtemp() + "/out"
    chunks = prepare_training_data(
        docs,
        eval_docs=eval_docs,
        contamination_max_frac=0.5,
        jaccard_threshold=0.5,
        chunk_size=8,
        chunk_stride=8,
        out_path=d,
    )
    rows = chunks.collect()
    survivors = {r.doc_id for r in rows}
    # 2 exact-dup'd, 3 near-dup'd, 4 low-quality, 5 contaminated
    assert survivors == {0, 1, 6}, survivors
    # near-dup canonical is the MIN doc id of the component (1 < 3)
    assert 3 not in survivors
    # stage 5: the email never reaches a chunk
    joined = " ".join(r.chunk_text for r in rows if r.doc_id == 6)
    # chunk tokenization lowercases, so the placeholder is <email>
    assert "bob@corp.example.com" not in joined and "<email>" in joined
    # chunking tiles exactly at stride == size
    for did in survivors:
        text = dict((r.doc_id, r.text) for r in docs.collect())[did]
        toks = text.lower().split()
        if did == 6:
            toks = [t if "@" not in t else "<email>" for t in toks]
        got = []
        for r in sorted((r for r in rows if r.doc_id == did),
                        key=lambda r: r.chunk_id):
            got.extend(r.chunk_text.split())
        assert got == toks, (did, got, toks)
    # strata column rides along; JSONL shards exist and round-trip
    assert all(r.source in ("src0", "src1") for r in rows)
    files = glob.glob(f"{d}/*.json.gz")
    assert files
    back = spark.read.json(d)
    assert back.count() == len(rows)


def test_prepare_training_data_mix_quotas(spark):
    docs = _corpus(spark)
    quotas = spark.createDataFrame(
        [("src0", 1), ("src1", 1)], "source string, quota int"
    )
    chunks = prepare_training_data(
        docs, quotas=quotas, chunk_size=8, chunk_stride=8
    )
    # at most one surviving doc per source after the draw
    per_src = (
        chunks.select("doc_id", "source").distinct()
        .groupBy("source").count().collect()
    )
    assert all(r["count"] <= 1 for r in per_src) and per_src
    # deterministic: the same draw on a rerun
    again = prepare_training_data(
        docs, quotas=quotas, chunk_size=8, chunk_stride=8
    )
    assert {(r.doc_id, r.chunk_id) for r in chunks.collect()} == {
        (r.doc_id, r.chunk_id) for r in again.collect()
    }


def test_shard_training_data_deterministic_and_balanced(spark):
    """Sharding is a pure function of identity+seed: same assignment
    under any partitioning/order; shards are roughly balanced; the
    within-shard sort key gives a stable total order."""
    from vector_database_spark.pipeline import shard_training_data

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {
        r["doc_id"]: (r["shard"], r["sort_key"])
        for r in shard_training_data(df, id_cols=("doc_id",)).collect()
    }
    shuffled = df.repartition(7).sortWithinPartitions(F.col("doc_id").desc())
    b = {
        r["doc_id"]: (r["shard"], r["sort_key"])
        for r in shard_training_data(shuffled, id_cols=("doc_id",)).collect()
    }
    assert a == b
    from collections import Counter

    sizes = Counter(s for s, _ in a.values())
    assert len(sizes) == 16
    assert max(sizes.values()) < 2 * min(sizes.values())
    # seed changes the layout
    c = {
        r["doc_id"]: r["shard"]
        for r in shard_training_data(
            df, id_cols=("doc_id",), seed="other"
        ).collect()
    }
    assert any(c[k] != a[k][0] for k in c)


def test_full_pipeline_to_tfrecord_shards(spark, tmp_path):
    """The whole training-data path composes end-to-end: prep funnel
    -> deterministic sharding -> TFRecord export -> distributed
    read-back reproduces every chunk exactly, with shard contents
    invariant to input partitioning."""
    from vector_database_spark.pipeline import shard_training_data
    from vector_database_spark.sources import trainio

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = prepare_training_data(docs).select(
        "doc_id", "chunk_id", "chunk_text"
    )
    sharded = shard_training_data(chunks, n_shards=4)
    out = str(tmp_path / "shards")
    manifest = trainio.export_tfrecord(
        sharded.repartition(4, "shard").withColumn(
            "key", F.concat_ws(":", "doc_id", "chunk_id")
        ),
        out,
        bytes_cols=("chunk_text", "key"),
        int_cols=("shard",),
    )
    n_chunks = chunks.count()
    assert sum(n for _, n in manifest) == n_chunks
    back = trainio.read_tfrecord(
        spark, out, bytes_cols=("chunk_text", "key"), int_cols=("shard",)
    )
    got = sorted((r["key"], r["chunk_text"]) for r in back.collect())
    want = sorted(
        (f"{r['doc_id']}:{r['chunk_id']}", r["chunk_text"])
        for r in chunks.collect()
    )
    assert got == want and got


def test_pack_sequences_invariants(spark):
    """Greedy packing contract: bins never exceed capacity unless a
    single oversized doc holds the bin alone; offsets are the exact
    running token sums; pack ids are dense per shard; output is
    partitioning-invariant (deterministic order inside the kernel)."""
    from vector_database_spark.pipeline import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = pack_sequences(docs, capacity=64, n_shards=8).collect()
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pack), rows in by_bin.items():
        rows.sort(key=lambda r: r.doc_id)
        total = sum(r.n_tok for r in rows)
        assert total <= 64 or len(rows) == 1, (shard, pack, total)
        acc = 0
        for r in rows:
            assert r.seq_offset == acc, (shard, pack, r.doc_id)
            acc += r.n_tok
    packs = sorted({(r.shard, r.pack_id) for r in out})
    for shard in {s for s, _ in packs}:
        ids = [p for s, p in packs if s == shard]
        assert ids == list(range(len(ids))), (shard, ids)

    again = pack_sequences(
        docs.repartition(13), capacity=64, n_shards=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curriculum_phases_exact_ntile(spark):
    """Distributed exact ntile == the naive single-window reference,
    including the n % k remainder distribution, descending order, and
    the n < k degenerate case (one row per phase)."""
    from pyspark.sql import functions as F

    from vector_database_spark.pipeline import curriculum_phases

    df = spark.range(103).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 31).alias("s")
    )
    got = {
        (r.doc_id, r.rank, r.phase)
        for r in curriculum_phases(
            df, score_col="s", id_col="doc_id", n_phases=4, partitions=7
        ).collect()
    }
    rows = sorted(
        [(int(r.doc_id), int(r.s)) for r in df.collect()],
        key=lambda t: (t[1], t[0]),
    )
    n, k = len(rows), 4
    base, rem = n // k, n % k
    want = set()
    for i, (d, _s) in enumerate(rows):
        r = i + 1
        cut = rem * (base + 1)
        ph = (
            (r - 1) // (base + 1) + 1
            if r <= cut
            else rem + (r - cut - 1) // base + 1
        )
        want.add((d, r, ph))
    assert got == want
    # remainder: first n%k phases hold base+1 rows
    sizes = {}
    for _d, _r, p in got:
        sizes[p] = sizes.get(p, 0) + 1
    assert sorted(sizes.values(), reverse=True) == [26, 26, 26, 25]

    # descending order flips the ranking
    desc = curriculum_phases(
        df, score_col="s", id_col="doc_id", n_phases=4, ascending=False
    )
    top = desc.where(F.col("rank") == 1).first()
    assert top["s"] == max(s for _d, s in rows)

    # n < k: one row per phase, phase == rank
    tiny = spark.range(3).select(
        F.col("id").alias("doc_id"), F.col("id").alias("s")
    )
    t = curriculum_phases(tiny, score_col="s", id_col="doc_id", n_phases=8)
    assert {(r.rank, r.phase) for r in t.collect()} == {(1, 1), (2, 2), (3, 3)}

    # empty input: schema must carry the INPUT's score dtype (round-9
    # ADVICE — a hardcoded long broke unions with double scores)
    dbl = spark.range(5).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.5).alias("s")
    )
    full = curriculum_phases(dbl, score_col="s", id_col="doc_id", n_phases=2)
    empty = curriculum_phases(
        dbl.where(F.lit(False)), score_col="s", id_col="doc_id", n_phases=2
    )
    assert empty.schema == full.schema and empty.count() == 0
    assert full.unionByName(empty).count() == 5


def test_allocate_budget_largest_remainder_invariants(spark):
    """Hamilton apportionment: sum(alloc) == budget exactly, every
    domain within 1 of its real proportion, ties broken by domain
    ascending, and degenerate budgets (0, budget < n_domains)
    allocate without error."""
    from pyspark.sql import functions as F

    from vector_database_spark.pipeline import allocate_budget

    d = spark.createDataFrame(
        [("web", 70), ("code", 20), ("books", 10)],
        "domain string, weight long",
    )
    rows = {r.domain: r for r in allocate_budget(d, budget=101).collect()}
    assert sum(r.alloc for r in rows.values()) == 101
    for r in rows.values():
        exact = 101 * r.weight / 100
        assert abs(r.alloc - exact) < 1.0
    # remainders: 101*70%100=70, 101*20%100=20, 101*10%100=10 ->
    # the single leftover seat goes to 'web'
    assert rows["web"].alloc == rows["web"].share + 1
    assert rows["code"].alloc == rows["code"].share
    # equal weights: remainder ties broken by domain ascending
    eq = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "domain string, weight long"
    )
    er = {r.domain: r.alloc for r in allocate_budget(eq, budget=7).collect()}
    assert er == {"a": 3, "b": 2, "c": 2}
    # degenerate budgets
    assert sum(
        r.alloc for r in allocate_budget(d, budget=0).collect()
    ) == 0
    assert sum(
        r.alloc for r in allocate_budget(d, budget=2).collect()
    ) == 2
    import pytest

    with pytest.raises(ValueError):
        allocate_budget(d, budget=-1)


def test_allocate_budget_guards_and_decimal_scale(spark):
    """ADVICE r10 (low): total weight 0 / negative weights raise a
    clear error instead of ANSI divide-by-zero, and token-scale
    magnitudes (1e9 budget x 1e12 weights ~ 1e21 products) apportion
    exactly in DECIMAL(38,0) instead of overflowing BIGINT."""
    import pytest

    from vector_database_spark.pipeline import allocate_budget

    zero = spark.createDataFrame(
        [("a", 0), ("b", 0)], "domain string, weight long"
    )
    with pytest.raises(ValueError, match="total weight"):
        allocate_budget(zero, budget=10)
    neg = spark.createDataFrame(
        [("a", 5), ("b", -1)], "domain string, weight long"
    )
    with pytest.raises(ValueError, match=">= 0"):
        allocate_budget(neg, budget=10)

    # the docstring's own use case: 1B tokens over corpus-sized
    # weights; budget * weight ~ 7e21 > 2^63
    big = spark.createDataFrame(
        [("web", 7_000_000_000_000), ("code", 2_000_000_000_000),
         ("books", 1_000_000_000_001)],
        "domain string, weight long",
    )
    budget = 1_000_000_000
    rows = {r.domain: r for r in allocate_budget(big, budget=budget).collect()}
    assert sum(r.alloc for r in rows.values()) == budget
    tot = 10_000_000_000_001
    for d, r in rows.items():
        # largest-remainder: within 1 of the real-valued proportion
        exact = budget * {"web": 7_000_000_000_000,
                          "code": 2_000_000_000_000,
                          "books": 1_000_000_000_001}[d] / tot
        assert abs(r.alloc - exact) < 1.0 + 1e-6, (d, r.alloc, exact)


def test_leakage_safe_split(spark):
    """p13 operator: group members always share a split; the bucket is
    the salted h60 of the GROUP id mod 100 (verified against a python
    md5 replay); pct=0/100 degenerate cuts; bad pct raises."""
    import hashlib

    import pytest

    from vector_database_spark.pipeline import leakage_safe_split

    groups = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "doc_id long, group_id long"
    )
    out = leakage_safe_split(groups, train_pct=80, salt=13).collect()
    assert len(out) == 70

    def h60py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)

    by_group: dict = {}
    for r in out:
        want_bucket = h60py(f"13:{r.group_id}") % 100
        assert r.bucket == want_bucket, (r.group_id, r.bucket, want_bucket)
        assert r.split == ("train" if r.bucket < 80 else "eval")
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())

    assert {
        r.split for r in leakage_safe_split(groups, train_pct=0).collect()
    } == {"eval"}
    assert {
        r.split for r in leakage_safe_split(groups, train_pct=100).collect()
    } == {"train"}
    with pytest.raises(ValueError, match="train_pct"):
        leakage_safe_split(groups, train_pct=101)
