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


class VectorDatabase:
    def __init__(
        self, spark: SparkSession, root_path: str, *, local_threshold: int = 20_000
    ):
        self.spark = spark
        self.root = root_path.rstrip("/")
        self.local_threshold = local_threshold
        self._idx_cache: DataFrame | None = None

    def _invalidate_index(self) -> None:
        self._idx_cache = None

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

    # -- ingest + index lifecycle (dbo.IndexDocument) --------------------
    def add_documents(self, df: DataFrame, *, reindex: bool = True) -> None:
        """Append (doc_id, text_id, text?, vector) rows; optionally
        rebuild the touched documents' index partitions (the
        IndexDocument swap, DDL.sql:352-419)."""
        cols = ["doc_id", "text_id", "vector"]
        if "text" in df.columns:
            cols.insert(2, "text")
        df.select(*cols).write.mode("append").partitionBy("doc_id").parquet(
            self.text_path
        )
        self._invalidate_index()
        if reindex:
            touched = [r[0] for r in df.select("doc_id").distinct().collect()]
            self.index_documents(touched)

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
            self._idx_cache = self.index().withColumnRenamed("text_id", "id")
        return self._idx_cache

    def search_candidates(
        self, vector: list[float], domain: float, doc_id: int | None = None
    ) -> DataFrame:
        """SQL `dbo.Search` semantics: box-candidate (doc_id, text_id)
        superset, no distance refinement (DDL.sql:234-295). Routed
        through the size-guarded auto strategy — an index beyond
        `BROADCAST_INDEX_MAX_ROWS` takes the iterative frontier join
        instead of a single-task-per-doc walk."""
        out = search_candidates_auto(
            self._index_named(), [(0, vector)], domain, doc_id=doc_id, pruning="box"
        )
        return out.select("doc_id", F.col("id").alias("text_id"))

    def search(
        self, vector: list[float], domain: float, doc_id: int | None = None
    ) -> DataFrame:
        """Tested `Find` semantics: exact Euclidean matches
        (doc_id-scoped when given): (text_id, dist)."""
        vecs = self.text().select("doc_id", F.col("text_id").alias("id"), "vector")
        if doc_id is not None:
            vecs = vecs.where(F.col("doc_id") == doc_id)
        res = _search(
            self._index_named(), vecs, [(0, vector)], domain, doc_id=doc_id
        )
        return res.select(F.col("id").alias("text_id"), "dist")

    def brute_force(self, vector: list[float], domain: float) -> DataFrame:
        vecs = self.text().select(F.col("text_id").alias("id"), "vector")
        return brute_force_search(vecs, [(0, vector)], domain).select(
            F.col("id").alias("text_id"), "dist"
        )

    # -- introspection (IndexHierarchy) ----------------------------------
    def hierarchy(self) -> DataFrame:
        return catalog.index_hierarchy(self.index())

    def stats(self) -> DataFrame:
        return catalog.index_stats(self.index())
