"""HDF5 vector source (reference O27: ann-benchmarks reader,
VectorIndex.MainTest/Program.cs:183-260).

The reference streams `/train` and `/test` 2-D float datasets in 100k
row chunks. Spark has no HDF5 datasource; the scalable shape is
chunked read → Parquet staging → parallel scan, exactly what the
reference's chunked reader does single-node.

Reader backends, in order: `h5py` when installed (full format
coverage, true partial reads); otherwise the pure-Python
`hdf5_native` reader (stdlib zlib + numpy — contiguous or
gzip/shuffle-chunked numeric datasets, the shape ann-benchmarks files
use; whole dataset materialized once, then chunk-sliced). O27 is no
longer gated on h5py being present.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - availability depends on environment
    import h5py  # type: ignore

    HAS_H5PY = True
except ImportError:
    h5py = None
    HAS_H5PY = False


def iter_hdf5_chunks(
    path: str, dataset: str, chunk_rows: int = 100_000
) -> Iterator[tuple[int, list]]:
    """Yield (start_row, rows) chunks from an HDF5 2-D float dataset —
    the reference's 100k-row streaming read (Program.cs:221-260).
    Uses h5py when available; otherwise the pure-Python native
    reader."""
    if HAS_H5PY:
        with h5py.File(path, "r") as f:  # pragma: no cover
            ds = f[dataset]
            n = ds.shape[0]
            for start in range(0, n, chunk_rows):
                yield start, ds[start : start + chunk_rows].tolist()
        return
    from vector_database_spark.sources.hdf5_native import read_hdf5_dataset

    arr = read_hdf5_dataset(path, dataset)
    for start in range(0, arr.shape[0], chunk_rows):
        yield start, arr[start : start + chunk_rows].tolist()


def stage_chunks_to_parquet(
    spark: SparkSession,
    chunks: Iterator[tuple[int, list]],
    out_path: str,
    *,
    mode: str = "overwrite",
) -> None:
    """Write (id, vector) chunk batches to a Parquet staging table.
    Works for any chunk iterator (HDF5, fake, network)."""
    first = True
    for start, rows in chunks:
        df = spark.createDataFrame(
            [(start + i, [float(x) for x in v]) for i, v in enumerate(rows)],
            "id long, vector array<float>",
        )
        df.write.mode(mode if first else "append").parquet(out_path)
        first = False


def read_hdf5_vectors(
    spark: SparkSession,
    path: str,
    dataset: str,
    staging_path: str,
    chunk_rows: int = 100_000,
) -> DataFrame:
    """HDF5 → Parquet staging → DataFrame (id, vector)."""
    stage_chunks_to_parquet(
        spark, iter_hdf5_chunks(path, dataset, chunk_rows), staging_path
    )
    return spark.read.parquet(staging_path)
