"""ARFF source: the attribute-relation text format the reference's
benchmark datasets ship in (its tests stream `artificial/2d-10c.arff`
over HTTP — MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:116-134,
VectorIndex.MainTest/Program.cs:183-260; here the file is local).

The header (@RELATION/@ATTRIBUTE ... @DATA) is parsed driver-side —
it is a few lines by construction — while the DATA section is read
distributed via ``spark.read.text`` with header/comment lines filtered
out by predicate, so an arbitrarily large data section never
concentrates on the driver. Numeric attributes become doubles; nominal
attributes (``{a,b,...}``) stay strings.

`read_arff_vectors` additionally packs the numeric attributes into the
engine's ``(id, vector)`` shape (ids = deterministic row order hash —
ARFF carries no key) ready for `build_index`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ATTR_RE = re.compile(r"@attribute\s+'?([^\s']+)'?\s+(.+)", re.IGNORECASE)


def _parse_header(path: str) -> list[tuple[str, bool]]:
    """[(name, is_numeric)] from the @ATTRIBUTE lines before @DATA."""
    attrs: list[tuple[str, bool]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("%"):
                continue
            if s.lower().startswith("@data"):
                break
            m = _ATTR_RE.match(s)
            if m:
                name, typ = m.group(1), m.group(2).strip().lower()
                attrs.append((name, typ in ("numeric", "real", "integer")))
    if not attrs:
        raise ValueError(f"no @ATTRIBUTE declarations found in {path}")
    return attrs


def read_arff(spark: SparkSession, path: str) -> DataFrame:
    """ARFF → DataFrame with one typed column per attribute."""
    attrs = _parse_header(path)
    lines = spark.read.text(path)
    data = lines.where(
        ~F.col("value").rlike(r"^\s*(%|@)") & (F.trim("value") != "")
    )
    parts = F.split(F.col("value"), ",")
    cols = []
    for i, (name, numeric) in enumerate(attrs):
        # ANSI-safe ARFF: '?' is the spec's missing-value token (NULL,
        # not a CAST_INVALID_INPUT job abort), and a short/ragged line
        # yields NULL instead of INVALID_ARRAY_INDEX — the CLAUDE.md
        # try_element_at rule
        c = F.trim(F.try_element_at(parts, F.lit(i + 1)))
        c = F.when(c == "?", F.lit(None)).otherwise(c)
        cols.append((c.try_cast("double") if numeric else c).alias(name))
    return data.select(*cols)


def read_arff_vectors(
    spark: SparkSession, path: str, *, label_col: str | None = None
) -> DataFrame:
    """ARFF → ``(id, vector[, label])`` for the vector engine. Ids are
    assigned by a deterministic content+position hash of the line so
    re-reads agree without a global sort."""
    attrs = _parse_header(path)
    numeric = [n for n, is_num in attrs if is_num]
    if not numeric:
        raise ValueError(f"{path} has no numeric attributes")
    df = read_arff(spark, path)
    vec = F.array(*[F.col(n).cast("double") for n in numeric])
    out = df.select(
        F.monotonically_increasing_id().alias("_mid"),
        vec.alias("vector"),
        *([F.col(label_col).alias("label")] if label_col else []),
    )
    # monotonically_increasing_id is partition-stable but sparse; rank
    # it down to dense 0..n-1 ids (one tiny window over the id column
    # only — acceptable for benchmark-fixture sizes; big corpora should
    # land as parquet with real keys instead)
    from pyspark.sql.window import Window

    w = Window.orderBy("_mid")
    return out.select(
        (F.row_number().over(w) - 1).cast("long").alias("id"),
        "vector",
        *(["label"] if label_col else []),
    )
