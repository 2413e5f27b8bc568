"""TFRecord + WebDataset training-data sinks: wire-format round
trips (no tensorflow/protobuf/webdataset deps — the formats are
re-derived), distributed write/read equality, CRC verification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_spark.sources import trainio


def test_example_wire_roundtrip_units():
    ex = trainio.encode_example(
        {"text": "héllo wörld", "doc_id": 42, "tokens": [1, 5, -3]}
    )
    back = trainio.decode_example(ex)
    assert back["text"].decode("utf-8") == "héllo wörld"
    assert back["doc_id"] == [42]
    assert back["tokens"] == [1, 5, -3]
    # crc32c known-answer (RFC 3720 test vector: 32 zero bytes)
    assert trainio.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert trainio.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_write_read_roundtrip(spark, tmp_path):
    docs = (
        spark.range(200)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc text "), F.col("id")).alias("text"),
        )
        .repartition(4)
    )
    path = str(tmp_path / "tfr")
    manifest = trainio.export_tfrecord(docs, path)
    assert sum(n for _, n in manifest) == 200
    assert len(manifest) == 4
    back = trainio.read_tfrecord(spark, path)
    got = sorted((r["doc_id"], r["text"]) for r in back.collect())
    want = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    assert got == want


def test_tfrecord_corruption_detected(spark, tmp_path):
    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    ).coalesce(1)
    path = str(tmp_path / "tfr2")
    [(fname, _)] = trainio.export_tfrecord(docs, path)
    raw = bytearray(open(fname, "rb").read())
    raw[20] ^= 0xFF  # flip a payload byte
    open(fname, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt"):
        list(trainio.iter_tfrecords(fname))


def test_webdataset_roundtrip(spark, tmp_path):
    docs = (
        spark.range(60)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id")).alias("text"),
            (F.col("id") % 3).alias("lang_id"),
        )
        .repartition(3)
    )
    path = str(tmp_path / "wds")
    manifest = trainio.export_webdataset(
        docs, path, meta_cols=("lang_id",)
    )
    assert sum(n for _, n in manifest) == 60
    back = trainio.read_webdataset(spark, path)
    import json

    got = sorted(
        (int(r["key"]), r["text"], json.loads(r["meta_json"])["lang_id"])
        for r in back.collect()
    )
    want = sorted(
        (r["doc_id"], r["text"], r["lang_id"]) for r in docs.collect()
    )
    assert got == want
    # plain tarfile can read the shards (format honesty)
    import os
    import tarfile

    shard = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )[0]
    with tarfile.open(shard) as t:
        names = t.getnames()
    assert any(n.endswith(".txt") for n in names)
    assert any(n.endswith(".json") for n in names)


def test_tfrecord_null_and_large_ints(spark, tmp_path):
    """Nullable and full-range int64 features survive exactly: ints
    travel Spark->kernel as strings (a nullable long column would
    reach pandas as float64 — NaN crashes int(), values above 2^53
    silently corrupt)."""
    big = (1 << 62) + 12345
    docs = spark.createDataFrame(
        [(1, "a", 7), (2, "b", None), (3, "c", big), (4, "d", -big)],
        "doc_id long, text string, extra long",
    ).repartition(2)
    path = str(tmp_path / "tfrn")
    trainio.export_tfrecord(docs, path, int_cols=("doc_id", "extra"))
    back = trainio.read_tfrecord(spark, path, int_cols=("doc_id", "extra"))
    got = {r["doc_id"]: r["extra"] for r in back.collect()}
    assert got == {1: 7, 2: None, 3: big, 4: -big}


def test_reexport_clears_stale_shards(spark, tmp_path):
    """A re-export with fewer partitions must not leave prior shards
    behind: the directory has to equal the returned manifest, or the
    readers silently include stale records."""
    import glob

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "tfr_restage")
    trainio.export_tfrecord(docs.repartition(6), path)
    assert len(glob.glob(f"{path}/part-*.tfrecord")) == 6
    manifest = trainio.export_tfrecord(docs.repartition(2), path)
    files = glob.glob(f"{path}/part-*.tfrecord")
    assert len(files) == 2 and len(manifest) == 2
    assert trainio.read_tfrecord(spark, path).count() == 40

    wpath = str(tmp_path / "wds_restage")
    trainio.export_webdataset(docs.repartition(5), wpath)
    assert len(glob.glob(f"{wpath}/shard-*.tar")) == 5
    trainio.export_webdataset(docs.repartition(2), wpath)
    assert len(glob.glob(f"{wpath}/shard-*.tar")) == 2
    assert trainio.read_webdataset(spark, wpath).count() == 40
