"""Catalog lifecycle: per-document index maintenance.

Reference surface (SURVEY.md §2/§3):

* ``index_document`` / ``index_documents`` — the `dbo.IndexDocument`
  orchestration (DDL.sql:352-419): scan the text table for the doc,
  build the tree, swap the doc's index rows atomically. In Spark the
  swap is a *dynamic partition overwrite* of the ``doc_id=...``
  partitions — sibling documents' partitions are untouched (the
  delete+insert of the reference without a transaction, because
  partition replacement is atomic per partition).
* ``delete_documents`` — FK-cascade analog (DDL.sql:332-343): remove a
  document's rows from documents/text/index tables (anti-join
  rewrite or partition drop).
* ``assign_ids`` — sequence-based id assignment (DDL.sql:328-330):
  dense ids via window row_number, or sparse-but-parallel ids via
  monotonically_increasing_id.
* ``index_hierarchy`` — `MemoryVectorIndex.IndexHierarchy`
  introspection (MemoryVectorIndex.cs:491-574): the index IS a
  DataFrame, so introspection is a self-join query producing
  (range_id, parent_range_id, depth, is_leaf, n_descendant_leaves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.operators.index_build import build_index


def index_documents(
    text_df: DataFrame,
    index_path: str,
    *,
    doc_ids: list[int] | None = None,
    id_col: str = "text_id",
    vector_col: str = "vector",
    doc_col: str = "doc_id",
    local_threshold: int = 20_000,
) -> None:
    """Build/refresh the BSP-tree index for the given documents (all
    documents when ``doc_ids`` is None) and swap it into the Parquet
    index table at ``index_path``.

    The write uses dynamic partition overwrite: only the doc_id
    partitions present in the new index are replaced — the Spark
    rendering of IndexDocument's per-doc delete+insert
    (DDL.sql:397-418)."""
    df = text_df
    if doc_ids is not None:
        df = df.where(F.col(doc_col).isin([int(d) for d in doc_ids]))
    idx = build_index(
        df,
        id_col=id_col,
        vector_col=vector_col,
        doc_col=doc_col,
        local_threshold=local_threshold,
    )
    (
        idx.withColumnRenamed("id", id_col)
        .repartition(doc_col)
        .write.mode("overwrite")
        .partitionBy(doc_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(index_path)
    )


def load_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(index_path)


def delete_documents(
    spark: SparkSession,
    index_path: str,
    doc_ids: list[int],
    *,
    table_dfs: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Cascade-delete documents: rewrite the index without the given
    doc partitions and return filtered versions of any supplied base
    tables (documents/text/...) — the FK cascade of DDL.sql:332-343
    expressed as anti-filters. The caller persists the returned tables
    wherever they live."""
    ids = [int(d) for d in doc_ids]
    idx = spark.read.parquet(index_path)
    # Materialize BEFORE overwriting the same path (read-under-write),
    # and force STATIC overwrite: under the session's dynamic
    # partition-overwrite default the deleted doc's partition would
    # simply be left in place (dynamic mode only replaces partitions
    # present in the new data). At scale use a table format with
    # DROP PARTITION (Delta/Iceberg) instead of a rewrite.
    remaining = idx.where(~F.col("doc_id").isin(ids)).localCheckpoint(eager=True)
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("doc_id")
        .parquet(index_path)
    )
    out = {}
    for name, df in (table_dfs or {}).items():
        out[name] = df.where(~F.col("doc_id").isin(ids))
    return out


def tail_rows(
    text_df: DataFrame,
    index_df: DataFrame,
    *,
    id_col: str = "text_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Rows present in the text table but absent from the index
    leaves — each document's un-compacted LSM *tail*.

    The reference mutates its in-memory trie per record
    (MemoryVectorIndex.cs:86-228); the Spark rendering keeps the
    indexed part immutable and serves fresh rows from this tail
    (brute-force searched — exact, and small by construction until
    compaction rebuilds the document). No extra state table: the tail
    IS the anti-join, so it survives restarts and cannot drift."""
    leaf_col = id_col if id_col in index_df.columns else "id"
    leaves = index_df.where(F.col(leaf_col).isNotNull()).select(
        F.col(doc_col).alias(doc_col), F.col(leaf_col).alias(id_col)
    )
    return text_df.join(leaves, [doc_col, id_col], "left_anti")


def assign_ids(
    df: DataFrame, *, id_col: str = "id", dense: bool = False, order_by: str | None = None
) -> DataFrame:
    """Sequence-style id assignment (DDL.sql:328-330).

    dense=False (default): `monotonically_increasing_id` — parallel,
    sparse, collision-free; the right choice at scale. dense=True:
    contiguous 0..N-1 via a global row_number window — single-partition
    bottleneck, use only for small dimension tables."""
    if dense:
        w = Window.orderBy(F.col(order_by) if order_by else F.monotonically_increasing_id())
        return df.withColumn(id_col, F.row_number().over(w).cast("long") - 1)
    return df.withColumn(id_col, F.monotonically_increasing_id())


def index_hierarchy(index_df: DataFrame) -> DataFrame:
    """Introspection query over the index DataFrame
    (O26, MemoryVectorIndex.cs:491-574):
    (doc_id, range_id, parent_range_id, depth, is_leaf).

    parent = (range_id - 1) div 2 by the heap numbering — no join
    needed; depth = floor(log2(range_id + 1))."""
    parent = F.when(
        F.col("range_id") > 0, F.expr("(range_id - 1) div 2")
    ).otherwise(F.lit(None).cast("long"))
    # exact integer depth: bit_length(range_id + 1) - 1 (a float log2
    # misrounds near 2^k for large ids)
    depth = (F.length(F.conv(F.col("range_id") + 1, 10, 2)) - 1).cast("int")
    # persisted indexes carry the leaf id under the caller's id column
    # name (e.g. text_id after index_documents)
    leaf_col = "id" if "id" in index_df.columns else "text_id"
    index_df = index_df.withColumn("_leaf_id", F.col(leaf_col))
    return index_df.select(
        "doc_id",
        "range_id",
        parent.alias("parent_range_id"),
        depth.alias("depth"),
        F.col("_leaf_id").isNotNull().alias("is_leaf"),
        "dimension",
        "mid",
    )


def index_stats(index_df: DataFrame) -> DataFrame:
    """Per-document tree statistics: node/leaf counts, max depth,
    id-split count — the EXPLAIN-style summary."""
    h = index_hierarchy(index_df)
    return h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("is_leaf").cast("long")).alias("n_leaves"),
        F.max("depth").alias("max_depth"),
        F.sum(
            ((~F.col("is_leaf")) & F.col("dimension").isNull()).cast("long")
        ).alias("n_id_splits"),
    )


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a BUCKETED (and bucket-sorted) table so
    repeated joins/aggregations on ``bucket_col`` are co-located and
    shuffle-free.

    This is the 100 TB answer to the reference's per-document access
    pattern: `dbo.TextIndex` is keyed (RangeID, DocID) and every
    IndexDocument/Search touches one doc (DDL.sql:209-227, 352-419).
    Bucketing text/index/embedding tables by the join key at write
    time means each of the daily join passes reads co-partitioned
    buckets — Catalyst drops BOTH exchanges from a bucketed SMJ (and
    the sort, when sort=True), which at 1000 executors is the
    difference between a full-corpus shuffle per query and none.

    Spark's bucketing lives in the session catalog (saveAsTable);
    ``path`` makes the table external so the files land where the
    caller wants them.
    """
    w = df.write.mode(mode).bucketBy(int(n_buckets), bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table saved by ``save_bucketed`` with its bucket layout
    (output partitioning metadata) intact — a plain parquet-path read
    would discard it and re-shuffle on the next join."""
    return spark.table(table)


def write_zordered(
    df: DataFrame,
    path: str,
    cols,
    *,
    bits: int = 10,
    num_files: int | None = None,
    bounds: dict | None = None,
    mode: str = "overwrite",
    verify_stats: bool = True,
) -> dict:
    """Write `df` as parquet physically clustered on the z-order curve
    of ``cols`` — the turnkey multi-dimensional-skipping write path
    (round-3 verdict item 7; `layout.cluster_by_zorder` computed the
    layout but left the write to the caller).

    Each output file covers a contiguous z-range, i.e. a tight
    bounding box in EVERY clustered dimension, so parquet min/max
    footer stats prune file reads on any of the columns — the layout
    Delta's OPTIMIZE ZORDER BY and ClickHouse's space-filling-curve
    ordering provide. One range-exchange shuffle + partition-local
    sort; at 100 TB set ``num_files`` so files land near the
    FS-friendly 0.5-1 GB.

    Returns per-column file-stats summaries; with ``verify_stats``
    (driver-side pyarrow footer scan — cheap, one footer per file) it
    raises if any clustered column's per-file min/max spans are
    degenerate (every file covering the full value range = no
    skipping possible), catching silently-broken clustering at write
    time instead of at query time.
    """
    import os

    from vector_database_spark.operators.layout import cluster_by_zorder

    clustered = cluster_by_zorder(
        df, list(cols), bits=bits, num_partitions=num_files, bounds=bounds
    )
    clustered.write.mode(mode).parquet(path)
    if not verify_stats:
        return {}
    import pyarrow.parquet as pq

    spans: dict[str, list[tuple]] = {c: [] for c in cols}
    n_files = 0
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        n_files += 1
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or st.min is None:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans[c].append((lo, hi))
    out: dict = {"n_files": n_files}
    for c in cols:
        ss = [s for s in spans[c] if s[0] is not None]
        if not ss:
            continue
        g_lo = min(s[0] for s in ss)
        g_hi = max(s[1] for s in ss)
        full = sum(1 for s in ss if s[0] == g_lo and s[1] == g_hi)
        out[c] = {
            "files": len(ss),
            "full_span_files": full,
            "mean_span_frac": (
                sum((s[1] - s[0]) for s in ss) / len(ss) / (g_hi - g_lo)
                if g_hi > g_lo
                else 0.0
            ),
        }
        if n_files >= 4 and full == len(ss) and g_hi > g_lo:
            raise ValueError(
                f"write_zordered: every file spans the full range of "
                f"'{c}' — clustering is not effective (bounds drift or "
                f"bits too low)"
            )
    return out


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions (`v=N` dirs with _SUCCESS) under a
    versioned table path — the same crash-safety listing rule as the
    streaming rollup LSM (partial writes are invisible)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                v = int(name.split("=", 1)[1])
            except ValueError:
                continue
            ok = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            if fs.exists(ok):
                out.append(v)
    return sorted(out)


def write_table_version(df: DataFrame, path: str) -> int:
    """Append a new immutable snapshot (`v=N+1`) of a versioned
    copy-on-write table. Readers only ever see committed snapshots
    (`_SUCCESS`-gated), so a crash mid-write is invisible. Returns
    the new version number."""
    spark = df.sparkSession
    vs = _list_versions(spark, path)
    new_v = (vs[-1] if vs else -1) + 1
    df.write.mode("overwrite").parquet(f"{path}/v={new_v}")
    return new_v


def read_table(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Read a versioned table at its latest (default) or any retained
    snapshot — parquet-level time travel matching the rollup state's
    `as_of_batch` story."""
    vs = _list_versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = vs[-1] if version is None else int(version)
    if v not in vs:
        raise ValueError(f"version {v} not in committed set {vs}")
    return spark.read.parquet(f"{path}/v={v}")


def merge_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    *,
    key_cols,
    delete_col: str | None = None,
) -> int:
    """MERGE INTO for a versioned parquet table (copy-on-write): rows
    matched on ``key_cols`` take the update's values, unmatched
    update rows insert, unmatched target rows carry over, and update
    rows whose ``delete_col`` is true delete their target row — the
    reference's delete+insert upsert (O15/O25, DDL.sql IndexDocument)
    generalized to any keyed table, with snapshot isolation: readers
    of the previous version are never disturbed, and the new version
    only becomes visible at its `_SUCCESS` commit.

    At 100 TB: one full-outer co-partitioned join per merge — the
    copy-on-write cost. For high-frequency small updates, keep an LSM
    tail instead (`api.py`'s incremental-insert path) and fold it in
    at compaction; this operator IS that compaction step. Returns the
    new version."""
    kp = [str(k) for k in key_cols]
    target = read_table(spark, path)
    # standard MERGE INTO preconditions, checked in ONE aggregate over
    # the (small) updates side: a NULL key would surface as a spurious
    # all-NULL "insert" from the full-outer join, and duplicate keys
    # would fan one target row into several output rows — both corrupt
    # the new snapshot silently if allowed through
    chk = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in kp]).alias("nd"),
        F.sum(
            F.when(
                sum(
                    (F.col(k).isNull().cast("int") for k in kp), F.lit(0)
                )
                > 0,
                1,
            ).otherwise(0)
        ).alias("n_null"),
    ).first()
    if chk["n_null"]:
        raise ValueError(
            f"merge_table: {chk['n_null']} update rows have NULL keys"
        )
    if chk["nd"] != chk["n"]:
        raise ValueError(
            "merge_table: duplicate keys in updates "
            f"({chk['n']} rows, {chk['nd']} distinct keys) — standard "
            "MERGE INTO semantics reject multiple matches per target row"
        )
    up_cols = [c for c in updates.columns if c not in kp and c != delete_col]
    t = target.select(
        *[F.col(c).alias(f"_t_{c}") for c in target.columns]
    )
    cond = None
    for k in kp:
        c = F.col(f"_t_{k}") == updates[k]
        cond = c if cond is None else cond & c
    joined = t.join(updates, cond, "full_outer")
    has_update = updates[kp[0]].isNotNull()
    deleted = (
        F.coalesce(updates[delete_col], F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    out_cols = []
    for c in target.columns:
        if c in kp:
            out_cols.append(
                F.coalesce(updates[c], F.col(f"_t_{c}")).alias(c)
            )
        elif c in up_cols:
            out_cols.append(
                F.when(has_update, updates[c])
                .otherwise(F.col(f"_t_{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"_t_{c}").alias(c))
    merged = joined.where(~(has_update & deleted)).select(*out_cols)
    # no checkpoint needed: the write goes to the NEW v=N+1 directory
    # while the plan reads v=N — there is no same-path
    # read-under-write, and an eager materialization would double the
    # copy-on-write I/O (round-4 review finding)
    return write_table_version(merged, path)


def vacuum_table(
    spark: SparkSession, path: str, *, keep_last: int = 2
) -> list[int]:
    """Expire old snapshots of a versioned table — the retention GC
    every snapshot-isolated format ships (Iceberg expire_snapshots /
    Delta VACUUM): keep the newest ``keep_last`` committed versions,
    delete the directories of the rest, and return the deleted
    version numbers.

    Safety rules (mirrors the rollup LSM's `retain_history`):
    * `keep_last >= 1` — the current snapshot is never deletable;
    * only COMMITTED (`_SUCCESS`-gated) versions count toward
      `keep_last`, and only committed versions are deleted —
      an in-flight writer's partial `v=N+1` directory is left alone
      (it is invisible to readers until its commit anyway);
    * deletion removes the `_SUCCESS` marker FIRST, so a crash
      mid-vacuum leaves an uncommitted (invisible) directory, never a
      readable-but-partial snapshot;
    * `read_table(version=expired)` raises afterwards — time travel
      is bounded by retention, the contract time-travel consumers
      must already handle (same as the rollup's pruned as-of reads).
    """
    if int(keep_last) < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _list_versions(spark, path)
    victims = vs[: -int(keep_last)] if len(vs) > int(keep_last) else []
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for v in victims:
        vdir = jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}")
        ok = jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS")
        if fs.exists(ok):
            fs.delete(ok, False)
        fs.delete(vdir, True)
    return victims
