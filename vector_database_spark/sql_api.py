"""SQL entry points: the reference's user interface, on Spark SQL.

The reference is driven entirely from SQL — ``dbo.Search`` /
``dbo.IndexDocument`` / ``dbo.BuildIndex`` stored procedures
(reference DDL.sql:234-295, 352-419) over the ``dbo.Text`` /
``dbo.TextIndex`` tables — so a user arriving from it writes SQL
first. This module gives the engine the same front door:

* `register_engine_views` — temp views for the vector table and the
  BSP-tree index (the engine's ``Text``/``TextIndex`` analogs).
* `register_tables` — temp views for a testdata directory's parquet
  tables, so any workload query can be typed straight into
  ``spark.sql``.
* `search_sql_text` / `sql_search` — the ball search as ONE SQL
  string: a ``WITH RECURSIVE`` tree descent (Spark 4 recursive CTEs)
  using the reference's own pruning predicates (descend low unless
  ``mid < q[dim] - domain``, high unless ``mid > q[dim] + domain``,
  id-splits descend both — DDL.sql:272-293), then exact refinement.
* `knn_sql_text` / `sql_knn` — brute-force top-k per query as SQL.

The recursive-CTE walk is the PARITY surface, not the scale path: it
re-joins the full index view at every recursion level, whereas the
DataFrame walker (`operators.search.search`) broadcasts/pins the
index once, keeps a slim frontier, and checkpoints level segments.
Both return identical rows (asserted in tests/test_sql_api.py); at
100 TB call the DataFrame path or keep the SQL text for ad-hoc use
on doc-scoped subtrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_L2 = (
    "sqrt(aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), "
    "CAST({b} AS ARRAY<DOUBLE>), (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every testdata parquet table in ``sf_dir``."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def register_engine_views(
    spark: SparkSession,
    vectors: DataFrame,
    index: DataFrame,
    *,
    vectors_view: str = "vectors",
    index_view: str = "vector_index",
) -> None:
    """Expose the engine state to SQL: ``vectors`` (id, vector) and
    ``vector_index`` (the BSP tree) as temp views — the analog of the
    reference's ``dbo.Text`` / ``dbo.TextIndex`` tables."""
    vectors.createOrReplaceTempView(vectors_view)
    index.createOrReplaceTempView(index_view)


def search_sql_text(
    domain: float,
    *,
    vectors_view: str = "vectors",
    index_view: str = "vector_index",
    queries_view: str = "queries",
    doc_id: int | None = None,
) -> str:
    """The ball search (``dbo.Search``, DDL.sql:234-295) as one SQL
    string over the registered views: recursive-CTE descent with the
    reference's pruning predicates, exact L2 refinement at the
    leaves. ``queries_view`` must have (qid, qvec)."""
    d = float(domain)
    doc_filter = f"AND doc_id = {int(doc_id)}" if doc_id is not None else ""
    qv = (
        "try_element_at(CAST(q.qvec AS ARRAY<DOUBLE>), "
        "CAST(c.dimension + 1 AS INT))"
    )
    dist = _L2.format(a="v.vector", b="q.qvec")
    return f"""
WITH RECURSIVE walk(qid, doc_id, range_id) AS (
  SELECT q.qid, r.doc_id, CAST(0 AS BIGINT) AS range_id
  FROM {queries_view} q
  CROSS JOIN (SELECT DISTINCT doc_id FROM {index_view}
              WHERE range_id = 0 {doc_filter}) r
  UNION ALL
  SELECT w.qid, w.doc_id, c.child
  FROM walk w
  JOIN (
    SELECT doc_id, range_id, dimension, mid,
           low_range_id AS child, TRUE AS is_low
    FROM {index_view} WHERE low_range_id IS NOT NULL
    UNION ALL
    SELECT doc_id, range_id, dimension, mid,
           high_range_id AS child, FALSE AS is_low
    FROM {index_view} WHERE high_range_id IS NOT NULL
  ) c ON c.doc_id = w.doc_id AND c.range_id = w.range_id
  JOIN {queries_view} q ON q.qid = w.qid
  WHERE c.dimension IS NULL
     OR (c.is_low AND c.mid >= {qv} - CAST({d} AS DOUBLE))
     OR ((NOT c.is_low) AND c.mid <= {qv} + CAST({d} AS DOUBLE))
)
SELECT qid, id, dist FROM (
  SELECT w.qid, i.id, {dist} AS dist
  FROM walk w
  JOIN {index_view} i ON i.doc_id = w.doc_id
   AND i.range_id = w.range_id AND i.id IS NOT NULL
  JOIN {vectors_view} v ON v.id = i.id
  JOIN {queries_view} q ON q.qid = w.qid
)
WHERE dist <= CAST({d} AS DOUBLE)
"""


def sql_search(
    spark: SparkSession,
    queries: DataFrame,
    domain: float,
    *,
    vectors_view: str = "vectors",
    index_view: str = "vector_index",
    doc_id: int | None = None,
) -> DataFrame:
    """Run the SQL-string search end-to-end: registers the query
    panel as a temp view and executes `search_sql_text`."""
    queries.createOrReplaceTempView("queries")
    return spark.sql(
        search_sql_text(
            domain,
            vectors_view=vectors_view,
            index_view=index_view,
            doc_id=doc_id,
        )
    )


def knn_sql_text(
    k: int,
    *,
    vectors_view: str = "vectors",
    queries_view: str = "queries",
) -> str:
    """Exact top-k per query as one SQL string (the brute-force
    oracle shape, rank ties broken on id)."""
    dist = _L2.format(a="v.vector", b="q.qvec")
    return f"""
SELECT qid, id, dist, rank FROM (
  SELECT q.qid, v.id, {dist} AS dist,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY {dist}, v.id) AS rank
  FROM {vectors_view} v CROSS JOIN {queries_view} q
)
WHERE rank <= {int(k)}
"""


def sql_knn(spark: SparkSession, queries: DataFrame, k: int) -> DataFrame:
    queries.createOrReplaceTempView("queries")
    return spark.sql(knn_sql_text(k))


def sql_index_document(
    spark: SparkSession,
    index_path: str,
    doc_id: int | None = None,
    *,
    text_view: str = "text",
    index_view: str = "vector_index",
    vectors_view: str = "vectors",
    local_threshold: int = 20_000,
) -> None:
    """``dbo.IndexDocument(@docID)`` (reference DDL.sql:352-419) as a
    CALL-style helper driven entirely by the SQL surface: reads the
    registered ``text_view`` (doc_id, text_id, vector — the
    ``dbo.Text`` analog; build it with any ``spark.sql`` statement),
    rebuilds that document's BSP-tree partition at ``index_path``
    with a dynamic-partition-overwrite swap (the procedure's
    per-doc delete+insert, DDL.sql:397-418 — other documents'
    partitions are untouched), and refreshes ``index_view`` +
    ``vectors_view`` so the next ``spark.sql`` search (e.g.
    `search_sql_text`) sees the new tree. ``doc_id=None`` rebuilds
    every document — the ``dbo.BuildIndex`` analog (also exposed as
    `sql_build_index`).

    Spark has no writable-procedure SQL statement (OSS `CALL` is
    reserved for DSv2 catalog procedures), so the front door is this
    one documented helper: SQL views in, SQL views out, one call —
    the reference user's build-and-swap flow, minus only the `EXEC`
    keyword."""
    from vector_database_spark.operators import catalog

    txt = spark.table(text_view)
    doc_ids = None if doc_id is None else [int(doc_id)]
    catalog.index_documents(
        txt, index_path, doc_ids=doc_ids, local_threshold=local_threshold
    )
    spark.read.parquet(index_path).withColumnRenamed(
        "text_id", "id"
    ).createOrReplaceTempView(index_view)
    txt.selectExpr("text_id AS id", "vector").createOrReplaceTempView(
        vectors_view
    )


def sql_build_index(
    spark: SparkSession,
    index_path: str,
    *,
    text_view: str = "text",
    index_view: str = "vector_index",
    vectors_view: str = "vectors",
    local_threshold: int = 20_000,
) -> None:
    """``dbo.BuildIndex`` analog: full rebuild from the text view —
    `sql_index_document` with ``doc_id=None``."""
    sql_index_document(
        spark,
        index_path,
        None,
        text_view=text_view,
        index_view=index_view,
        vectors_view=vectors_view,
        local_threshold=local_threshold,
    )
