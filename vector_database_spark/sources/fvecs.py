"""fvecs/ivecs/bvecs vector source — the TEXMEX / ann-benchmarks
interchange format (SIFT1M, GIST1M, Deep1B ship in it).

Record layout: little-endian int32 dimension d, then d components
(float32 for .fvecs, int32 for .ivecs, uint8 for .bvecs). All records
in a file share d, so the file is fixed-stride and splittable by BYTE
RANGE — the property the distributed reader exploits: the driver stats
the file and plans (start_row, n_rows) chunks; each task seeks and
reads only its slice. No full-file driver read, no single-task scan.

This is the binary sibling of the reference's ann-benchmarks HDF5 path
(VectorIndex.MainTest/Program.cs:183-260) and needs zero external
libraries. The path must be visible from executors (local disk here;
shared FS on a cluster — for object stores, stage via binaryFile).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

_COMPONENT = {
    "fvecs": ("<f4", 4),
    "ivecs": ("<i4", 4),
    "bvecs": ("<u1", 1),
}


def _sniff(path: str, kind: str) -> tuple[int, int, int]:
    """Return (dims, record_bytes, n_records) from the file header."""
    dtype, csize = _COMPONENT[kind]
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) < 4:
        raise ValueError(f"{path}: too short for a {kind} file")
    (d,) = struct.unpack("<i", head)
    if d <= 0 or d > 1_000_000:
        raise ValueError(f"{path}: implausible dimension {d}")
    rec = 4 + d * csize
    if size % rec != 0:
        raise ValueError(
            f"{path}: size {size} is not a multiple of record size {rec} "
            f"(mixed-dimension {kind} files are not splittable)"
        )
    return d, rec, size // rec


def read_vecs(
    spark: SparkSession,
    path: str,
    *,
    kind: str | None = None,
    chunk_rows: int = 100_000,
    id_offset: int = 0,
) -> DataFrame:
    """Read a TEXMEX vector file as (id, vector) — id is the 0-based
    record position (+ ``id_offset``), the convention ground-truth
    .ivecs files index into.

    The driver plans byte-range chunks; `mapInPandas` tasks seek into
    the file and decode their slice with one `np.frombuffer` reshape —
    Arrow-batched, never through the driver."""
    kind = kind or path.rsplit(".", 1)[-1].lower()
    if kind not in _COMPONENT:
        raise ValueError(f"unknown vecs kind {kind!r} (fvecs/ivecs/bvecs)")
    dims, rec, n = _sniff(path, kind)
    dtype, _csize = _COMPONENT[kind]
    out_type = "array<int>" if kind == "ivecs" else (
        "array<float>" if kind == "fvecs" else "array<smallint>"
    )

    chunks = [
        (start, min(chunk_rows, n - start)) for start in range(0, n, chunk_rows)
    ]
    plan = spark.createDataFrame(chunks, "start long, rows long").repartition(
        max(1, min(len(chunks), spark.sparkContext.defaultParallelism))
    )
    fpath, fkind, fdims, frec = path, kind, dims, rec
    foff = int(id_offset)

    def load(batches):
        import numpy as np
        import pandas as pd

        comp = {"fvecs": "<f4", "ivecs": "<i4", "bvecs": "<u1"}[fkind]
        for pdf in batches:
            for start, rows in zip(pdf["start"], pdf["rows"]):
                start, rows = int(start), int(rows)
                with open(fpath, "rb") as f:
                    f.seek(start * frec)
                    buf = f.read(rows * frec)
                raw = np.frombuffer(buf, dtype=np.uint8).reshape(rows, frec)
                hdr = raw[:, :4].copy().view("<i4").ravel()
                if not (hdr == fdims).all():
                    raise ValueError(
                        f"{fpath}: record dimension changed mid-file "
                        f"(expected {fdims})"
                    )
                body = raw[:, 4:].copy().view(comp)
                if fkind == "bvecs":
                    body = body.astype(np.int16)
                yield pd.DataFrame(
                    {
                        "id": np.arange(start, start + rows, dtype=np.int64)
                        + foff,
                        "vector": list(body),
                    }
                )

    return plan.mapInPandas(load, f"id long, vector {out_type}")


def write_vecs(path: str, vectors, *, kind: str | None = None) -> int:
    """Write an iterable of vectors as a TEXMEX file (test fixtures /
    interop export; driver-local — for bulk export use parquet).
    Returns the record count."""
    kind = kind or path.rsplit(".", 1)[-1].lower()
    if kind not in _COMPONENT:
        raise ValueError(f"unknown vecs kind {kind!r} (fvecs/ivecs/bvecs)")
    import numpy as np

    comp = {"fvecs": "<f4", "ivecs": "<i4", "bvecs": "<u1"}[kind]
    n = 0
    with open(path, "wb") as f:
        for v in vectors:
            a = np.asarray(v, dtype=comp)
            f.write(struct.pack("<i", len(a)))
            f.write(a.tobytes())
            n += 1
    return n
