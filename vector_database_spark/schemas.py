"""Schemas and loaders for the engine's core tables.

Data model (SURVEY.md §1): the reference stores documents
(`dbo.Document`, DDL.sql:302-309), text chunks with JSON-string float
vectors (`dbo.Text`, DDL.sql:316-326), exploded points
(`dbo.PointType`, DDL.sql:4-13) and the BSP-tree index
(`dbo.TextIndex`, DDL.sql:209-227). Here vectors are native
``array<float>`` columns and the index is a plain DataFrame/Parquet
table partitioned by ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# dbo.Text analog: native array<float> instead of a JSON string column.
TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("vector", T.ArrayType(T.FloatType(), False), True),
    ]
)

# dbo.PointType analog — long/EAV form the set-based build operates on.
POINTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("value", T.FloatType(), False),
    ]
)

# dbo.TextIndex analog. `dimension` is 0-based. Leaf rows: `id` set and
# child/dimension columns null; id-split rows (stdev = 0): dimension and
# mid null but children set (DDL.sql:190-199).
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("range_id", T.LongType(), False),
        T.StructField("dimension", T.IntegerType(), True),
        T.StructField("mid", T.DoubleType(), True),
        T.StructField("low_range_id", T.LongType(), True),
        T.StructField("high_range_id", T.LongType(), True),
        T.StructField("id", T.LongType(), True),
    ]
)

# Driver-generated fixture tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from a scale-factor directory."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def ingest_json_vectors(
    df: DataFrame, json_col: str = "vector_json", out_col: str = "vector"
) -> DataFrame:
    """Parse the reference's JSON-string vector encoding into a native
    array<float> (reference: `openjson(Vector)`, DDL.sql:370-371)."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), "array<float>"))


def explode_points(
    df: DataFrame, id_col: str = "id", vector_col: str = "vector"
) -> DataFrame:
    """Wide vectors -> long point form `(id, idx, value)`
    (reference: dbo.PointType, DDL.sql:4-13)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vector_col)).alias("idx", "value"),
    )
