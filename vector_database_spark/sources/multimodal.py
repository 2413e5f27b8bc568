"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms.

The Spark-side contract is fully real and tested: schema, partitioning,
`mapInPandas` batch shape, metadata propagation, deterministic fake
featurizers. The actual codec calls (PIL/ffmpeg/torchaudio) are not
available in this container, so the decode kernels are stubbed behind
`NotImplementedError` with a deterministic fake used by default in
tests — swap `decode_fn` for a real codec on a cluster with the libs
installed.

Design for 100 TB of media:
* binary payloads stay in their own parquet column chunk (columnar
  pruning means metadata-only queries never read bytes);
* decode/featurize runs in `mapInPandas` so bytes move driver-free,
  Arrow-batched, one Python worker per core;
* partition by content hash prefix to spread large objects evenly;
* `maxRecordsPerBatch` bounds worker memory per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def real_image_decode(payload: bytes) -> "object":
    """Real decode hook — requires an image codec library."""
    raise NotImplementedError(
        "image codecs not available in this environment; supply a "
        "decode_fn (e.g. PIL.Image.open) on a cluster that has them"
    )


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: byte-histogram moments.
    Real pipelines plug a model here; the Spark plumbing is identical."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload) // dim, 1)
    return [round(a / (255.0 * n), 6) for a in acc]


def extract_features(
    media_df: DataFrame,
    *,
    feature_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/featurize media payloads with `mapInPandas` — the bytes
    never visit the driver; each Arrow batch is processed columnar-
    wise in a worker."""
    fn = feature_fn or fake_feature

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


def sample_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived
    from the id) for tests and demos."""
    def gen():
        import random

        for i in range(n):
            rng = random.Random(seed + i)
            size = 128 + (i % 5) * 64
            payload = bytes(rng.randrange(256) for _ in range(size))
            kind = ["image", "audio", "video"][i % 3]
            yield (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    kind
                ],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                1000 * (i % 30) if kind != "image" else None,
            )

    return spark.createDataFrame(gen(), MEDIA_SCHEMA)


def resize_stub(
    media_df: DataFrame, *, width: int, height: int
) -> DataFrame:
    """Resize plumbing: the transform signature and schema are real;
    the pixel work requires a codec (NotImplementedError in the
    kernel when hit without one)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "image resize requires a codec library (PIL/opencv); "
                "not available in this environment"
            )
            yield pdf  # pragma: no cover

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in MEDIA_SCHEMA.fields
    )
    return media_df.mapInPandas(run, out_schema)
