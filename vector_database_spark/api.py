"""`VectorDatabase` — the reference's procedure surface, Spark-native.

Mapping (a reference user switches 1:1):

| Reference                         | Here                              |
|-----------------------------------|-----------------------------------|
| `dbo.Document` / `dbo.Text` rows  | `add_documents(df)` (Parquet)     |
| `dbo.IndexDocument(@docID)`       | `index_document(doc_id)`          |
| `dbo.Search(@point, @domain, @docId)` → candidates | `search_candidates(vector, domain, doc_id)` |
| tested `Find` + Euclidean predicate | `search(vector, domain, doc_id)` |
| `MemoryVectorIndex.Remove`        | `delete_documents([ids])`         |
| `IndexHierarchy`                  | `hierarchy()` / `stats()`         |

Storage layout under `root_path`:
  text/       — (doc_id, text_id, text, vector) partitioned by doc_id
  text_index/ — BSP-tree rows partitioned by doc_id
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_spark.operators import catalog
from vector_database_spark.operators.search import (
    brute_force_search,
    search as _search,
    search_candidates_auto,
)


# rebuild a document's tree once this fraction of its rows live in the
# un-indexed tail (LSM-style compaction trigger for per-record adds)
COMPACTION_THRESHOLD = 0.2


class VectorDatabase:
    def __init__(
        self, spark: SparkSession, root_path: str, *, local_threshold: int = 20_000
    ):
        self.spark = spark
        self.root = root_path.rstrip("/")
        self.local_threshold = local_threshold
        self._idx_cache: DataFrame | None = None
        self._tail_known_empty: bool | None = None

    def _invalidate_index(self) -> None:
        self._idx_cache = None
        self._tail_known_empty = None

    # -- storage ---------------------------------------------------------
    @property
    def text_path(self) -> str:
        return f"{self.root}/text"

    @property
    def index_path(self) -> str:
        return f"{self.root}/text_index"

    def text(self) -> DataFrame:
        return self.spark.read.parquet(self.text_path)

    def index(self) -> DataFrame:
        return self.spark.read.parquet(self.index_path)

    _INDEX_DDL = (
        "doc_id long, range_id long, dimension int, mid double, "
        "low_range_id long, high_range_id long, text_id long"
    )

    def _index_or_empty(self) -> DataFrame:
        """The index table, or an empty frame before the first build
        (tail-only serving: everything brute-force refined)."""
        try:
            return self.index()
        except Exception:
            return self.spark.createDataFrame([], self._INDEX_DDL)

    # -- ingest + index lifecycle (dbo.IndexDocument) --------------------
    def add_documents(self, df: DataFrame, *, reindex: bool | str = True) -> None:
        """Append (doc_id, text_id, text?, vector) rows.

        ``reindex``:
        * ``True``  — rebuild the touched documents' index partitions
          (the IndexDocument swap, DDL.sql:352-419);
        * ``False`` — leave the new rows in the un-indexed tail
          (searches stay exact: the tail is brute-force refined);
        * ``"auto"`` — per-record-insert mode (the reference's
          ``Add``, MemoryVectorIndex.cs:86-228, amortized): rebuild
          only documents whose tail fraction exceeds
          `COMPACTION_THRESHOLD`; the rest serve from the tail.
        """
        cols = ["doc_id", "text_id", "vector"]
        if "text" in df.columns:
            cols.insert(2, "text")
        df.select(*cols).write.mode("append").partitionBy("doc_id").parquet(
            self.text_path
        )
        self._invalidate_index()
        if reindex is True:
            touched = [r[0] for r in df.select("doc_id").distinct().collect()]
            self.index_documents(touched)
        elif reindex == "auto":
            touched = [r[0] for r in df.select("doc_id").distinct().collect()]
            self.compact(touched)

    def tail(self) -> DataFrame:
        """Un-indexed rows (see `catalog.tail_rows`)."""
        return catalog.tail_rows(self.text(), self._index_or_empty())

    def compact(
        self, doc_ids: list[int] | None = None, *, threshold: float | None = None
    ) -> list[int]:
        """Rebuild every document whose un-indexed tail exceeds
        ``threshold`` (fraction of the doc's rows; default
        `COMPACTION_THRESHOLD`). Never-indexed documents have tail
        fraction 1.0 and always compact. Returns the doc ids rebuilt."""
        thr = COMPACTION_THRESHOLD if threshold is None else float(threshold)
        txt = self.text()
        if doc_ids is not None:
            txt = txt.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
        totals = txt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        tails = (
            catalog.tail_rows(txt, self._index_or_empty())
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tail"))
        )
        over = (
            totals.join(tails, "doc_id")
            .where(F.col("n_tail") > F.lit(thr) * F.col("n"))
            .select("doc_id")
            .collect()
        )
        docs = [int(r.doc_id) for r in over]
        if docs:
            self.index_documents(docs)
        return docs

    def index_document(self, doc_id: int) -> None:
        self.index_documents([doc_id])

    def index_documents(self, doc_ids: list[int] | None = None) -> None:
        catalog.index_documents(
            self.text(),
            self.index_path,
            doc_ids=doc_ids,
            local_threshold=self.local_threshold,
        )
        self._invalidate_index()

    def delete_documents(self, doc_ids: list[int]) -> None:
        """Cascade delete: text rows + index partitions."""
        self._invalidate_index()
        remaining = catalog.delete_documents(
            self.spark, self.index_path, doc_ids, table_dfs={"text": self.text()}
        )
        txt = remaining["text"].localCheckpoint(eager=True)
        (
            txt.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("doc_id")
            .parquet(self.text_path)
        )

    # -- queries (dbo.Search / Find) -------------------------------------
    def _index_named(self) -> DataFrame:
        # search operators expect the leaf id under `id`; the DataFrame
        # object is cached across calls so the auto-strategy's memoized
        # row count survives (writes invalidate it).
        if self._idx_cache is None:
            self._idx_cache = self._index_or_empty().withColumnRenamed(
                "text_id", "id"
            )
        return self._idx_cache

    def _tail_scoped(self, doc_id: int | None) -> DataFrame | None:
        """The un-indexed tail (doc-scoped), or None when known empty —
        the common all-compacted case costs one anti-join probe per
        facade instance, not per query."""
        if self._tail_known_empty is None:
            self._tail_known_empty = self.tail().isEmpty()
        if self._tail_known_empty:
            return None
        t = self.tail()
        if doc_id is not None:
            t = t.where(F.col("doc_id") == doc_id)
        return t

    def search_candidates(
        self, vector: list[float], domain: float, doc_id: int | None = None
    ) -> DataFrame:
        """SQL `dbo.Search` semantics: box-candidate (doc_id, text_id)
        superset, no distance refinement (DDL.sql:234-295). Routed
        through the size-guarded auto strategy — an index beyond
        `BROADCAST_INDEX_MAX_ROWS` takes the iterative frontier join
        instead of a single-task-per-doc walk. Tail rows (not yet
        compacted into the tree) are box-filtered directly."""
        out = search_candidates_auto(
            self._index_named(), [(0, vector)], domain, doc_id=doc_id, pruning="box"
        ).select("doc_id", F.col("id").alias("text_id"))
        t = self._tail_scoped(doc_id)
        if t is not None:
            from vector_database_spark.functions.vector import linf_distance

            q = F.lit([float(x) for x in vector]).cast("array<double>")
            out = out.unionByName(
                t.where(linf_distance(F.col("vector"), q) <= F.lit(float(domain)))
                .select("doc_id", "text_id")
            )
        return out

    def search(
        self,
        vector: list[float],
        domain: float,
        doc_id: int | None = None,
        *,
        where=None,
    ) -> DataFrame:
        """Tested `Find` semantics: exact Euclidean matches
        (doc_id-scoped when given): (text_id, dist). Exact regardless
        of compaction state: indexed rows go through the tree, tail
        rows are brute-force refined.

        ``where`` (optional Column or SQL string over the text
        table's columns) makes this the facade's FILTERED search —
        the reference `Find`'s caller-predicate contract
        (MemoryVectorIndex.cs:237-345): applied to both the indexed
        side (via `search(where=)` — exact filter-then-refine) and
        the un-compacted tail, so reads stay exact at every point of
        the ingest lifecycle."""
        pred = None
        if where is not None:
            pred = F.expr(where) if isinstance(where, str) else where
        txt = self.text()
        if pred is not None:
            # filter on the TEXT table's own column names (text_id,
            # doc_id, vector, metadata...) before any rename, so one
            # predicate spells the same on the indexed and tail sides
            txt = txt.where(pred)
        vecs = txt.select("doc_id", F.col("text_id").alias("id"), "vector")
        if doc_id is not None:
            vecs = vecs.where(F.col("doc_id") == doc_id)
        res = _search(
            self._index_named(), vecs, [(0, vector)], domain, doc_id=doc_id
        ).select(F.col("id").alias("text_id"), "dist")
        t = self._tail_scoped(doc_id)
        if t is not None:
            if pred is not None:
                t = t.where(pred)
            tail_hits = brute_force_search(
                t.select(F.col("text_id").alias("id"), "vector"),
                [(0, vector)],
                domain,
            ).select(F.col("id").alias("text_id"), "dist")
            res = res.unionByName(tail_hits)
        return res

    def delete_vectors(
        self,
        vector: list[float],
        distance: float,
        predicate: str | None = None,
        doc_id: int | None = None,
    ) -> int:
        """The reference's vicinity-predicated record delete
        (``MemoryVectorIndex.Remove(vector, distance, predicate)``,
        MemoryVectorIndex.cs:358-489): remove every record within L2
        ``distance`` of ``vector`` that also satisfies ``predicate``
        (a SQL expression over the text table's columns — like the
        reference's predicate it VERIFIES the match), then compact the
        touched documents' index partitions (the consolidation walk,
        re-expressed as a partition rebuild). Returns #records removed.
        """
        hits = self.search(vector, distance, doc_id=doc_id).select("text_id")
        txt = self.text()
        victims = txt.join(hits, "text_id", "left_semi")
        if predicate:
            victims = victims.where(F.expr(predicate))
        victims = victims.select("doc_id", "text_id").localCheckpoint(eager=True)
        touched = [int(r.doc_id) for r in victims.select("doc_id").distinct().collect()]
        if not touched:
            return 0
        n_removed = victims.count()
        remaining_touched = (
            txt.where(F.col("doc_id").isin(touched))
            .join(victims, ["doc_id", "text_id"], "left_anti")
            .localCheckpoint(eager=True)  # materialize before overwrite
        )
        survivors = {
            int(r.doc_id)
            for r in remaining_touched.select("doc_id").distinct().collect()
        }
        emptied = [d for d in touched if d not in survivors]
        kept = [d for d in touched if d in survivors]
        if kept:
            # dynamic overwrite replaces exactly the touched, still
            # non-empty doc partitions
            (
                remaining_touched.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("doc_id")
                .parquet(self.text_path)
            )
            self._invalidate_index()
            self.index_documents(kept)
        if emptied:
            # dynamic overwrite cannot DROP a partition — route fully
            # emptied documents through the cascade delete
            self.delete_documents(emptied)
        self._invalidate_index()
        return int(n_removed)

    def brute_force(self, vector: list[float], domain: float) -> DataFrame:
        vecs = self.text().select(F.col("text_id").alias("id"), "vector")
        return brute_force_search(vecs, [(0, vector)], domain).select(
            F.col("id").alias("text_id"), "dist"
        )

    def search_stats(
        self, vector: list[float], domain: float, doc_id: int | None = None
    ) -> DataFrame:
        """Pruning-efficiency telemetry for one query — candidates the
        tree walk produced vs matches the refinement kept (the number
        you watch while tuning ``domain``; the reference's tests count
        predicate invocations the same way,
        MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:164-196).
        Covers the indexed rows; un-compacted tail rows are served
        brute-force and don't inform tree health."""
        from vector_database_spark.operators.search import search_stats

        return search_stats(
            self._index_named(),
            self.text(),
            [(0, vector)],
            domain,
            id_col="text_id",
            doc_id=doc_id,
        )

    # -- introspection (IndexHierarchy) ----------------------------------
    def hierarchy(self) -> DataFrame:
        return catalog.index_hierarchy(self.index())

    def stats(self) -> DataFrame:
        return catalog.index_stats(self.index())
