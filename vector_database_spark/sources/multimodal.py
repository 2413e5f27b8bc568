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
    """Decode hook for COMPRESSED formats (JPEG/PNG) — requires a
    codec library; supply e.g. ``PIL.Image.open`` on a cluster that
    has one. Uncompressed netpbm images decode natively: see
    `decode_ppm` (pure numpy, no external libs)."""
    raise NotImplementedError(
        "compressed-image codecs not available in this environment; "
        "supply a decode_fn (e.g. PIL.Image.open) on a cluster that "
        "has them — or use P6 PPM payloads with decode_ppm"
    )


def decode_ppm(payload: bytes):
    """Decode a binary P6 PPM (netpbm) image to ``uint8 (h, w, 3)`` —
    pure bytes + numpy, no codec library. P6 is a real interchange
    format (ImageMagick/netpbm write it), so this is a genuinely
    working decode path, not a stub."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


def encode_ppm(arr) -> bytes:
    """Encode ``uint8 (h, w, 3)`` as binary P6 PPM."""
    import numpy as np

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def resize_bilinear(arr, width: int, height: int):
    """Bilinear resample to (height, width, 3) — vectorized numpy
    (align-corners=False convention, like torchvision/PIL)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    ys = (np.arange(height) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width) + 0.5) * (w / width) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(payload: bytes, *, grid: int = 2) -> list[float]:
    """REAL image featurizer (no libs): decode P6 PPM, downpool to a
    ``grid×grid`` patch grid, emit per-patch per-channel means in
    [0, 1] — a 3·grid² float vector (the classic color-layout
    descriptor shape)."""
    import numpy as np

    a = decode_ppm(payload).astype(np.float64)
    h, w, _ = a.shape
    ys = np.linspace(0, h, grid + 1).astype(np.int64)
    xs = np.linspace(0, w, grid + 1).astype(np.int64)
    out: list[float] = []
    for gy in range(grid):
        for gx in range(grid):
            patch = a[ys[gy] : max(ys[gy + 1], ys[gy] + 1),
                      xs[gx] : max(xs[gx + 1], xs[gx] + 1)]
            out.extend(
                round(float(v) / 255.0, 6) for v in patch.mean(axis=(0, 1))
            )
    return out


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

        import numpy as np

        for i in range(n):
            rng = random.Random(seed + i)
            kind = ["image", "audio", "video"][i % 3]
            if kind == "image":
                # REAL P6 PPM payload: deterministic gradient + noise
                w = h = 16 + 8 * (i % 3)
                g = np.random.default_rng(seed + i)
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (255 * xx / max(w - 1, 1)),
                        (255 * yy / max(h - 1, 1)),
                        g.integers(0, 256, size=(h, w)),
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payload, pw, ph = encode_ppm(img), w, h
            else:
                size = 128 + (i % 5) * 64
                payload = bytes(rng.randrange(256) for _ in range(size))
                pw = ph = None
            yield (
                i,
                kind,
                {"image": "image/x-portable-pixmap", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                payload,
                pw,
                ph,
                1000 * (i % 30) if kind != "image" else None,
            )

    return spark.createDataFrame(gen(), MEDIA_SCHEMA)


def resize_images(
    media_df: DataFrame, *, width: int, height: int
) -> DataFrame:
    """REAL image resize over `mapInPandas` — P6 PPM payloads are
    decoded (pure numpy), bilinear-resampled, re-encoded, and the
    width/height metadata updated; non-image rows (and compressed
    formats this container cannot decode) pass through untouched.
    Bytes never visit the driver; each Arrow batch is one worker
    call."""
    w_out, h_out = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            widths = []
            heights = []
            for kind, payload, w0, h0 in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if (
                    kind == "image"
                    and payload is not None
                    and bytes(payload[:2]) == b"P6"
                ):
                    arr = decode_ppm(bytes(payload))
                    payloads.append(encode_ppm(resize_bilinear(arr, w_out, h_out)))
                    widths.append(w_out)
                    heights.append(h_out)
                else:
                    payloads.append(payload)
                    widths.append(w0)
                    heights.append(h0)
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in MEDIA_SCHEMA.fields
    )
    return media_df.mapInPandas(run, out_schema)


# Back-compat alias for the round-1 name (the kernel is no longer a
# stub for netpbm payloads).
resize_stub = resize_images
