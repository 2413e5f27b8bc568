"""Sources/sinks: CSV export, HDF5 staging (faked chunks), multimodal
plumbing, JSON-vector ingest."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from vector_database_spark.operators.index_build import build_index
from vector_database_spark.schemas import explode_points, ingest_json_vectors
from vector_database_spark.sources.export import export_index_csv, export_vectors_csv
from vector_database_spark.sources.generators import random_uniform
from vector_database_spark.sources.hdf5 import stage_chunks_to_parquet
from vector_database_spark.sources.multimodal import (
    decode_ppm,
    image_features,
    resize_images,
    extract_features,
    fake_feature,
    resize_stub,
    sample_media,
)


def test_export_csv_roundtrip(spark):
    vecs = random_uniform(spark, 50, 3, seed=9)
    idx = build_index(vecs, local_threshold=16)
    tmp = tempfile.mkdtemp()
    export_index_csv(idx, f"{tmp}/idx_csv")
    back = spark.read.option("header", "true").csv(f"{tmp}/idx_csv")
    assert back.count() == idx.count()
    export_vectors_csv(vecs, f"{tmp}/vec_csv")
    vback = spark.read.option("header", "true").option("sep", "|").csv(f"{tmp}/vec_csv")
    row = vback.where(F.col("id") == "0").collect()[0]
    assert len(row.vector.split(",")) == 3


def test_hdf5_staging(spark):
    # fake chunk iterator exercises the staging path the HDF5 reader uses
    chunks = iter(
        [(0, [[0.1, 0.2], [0.3, 0.4]]), (2, [[0.5, 0.6]])]
    )
    tmp = tempfile.mkdtemp()
    stage_chunks_to_parquet(spark, chunks, f"{tmp}/staged")
    df = spark.read.parquet(f"{tmp}/staged")
    rows = {r.id: list(r.vector) for r in df.collect()}
    assert len(rows) == 3 and rows[2] == pytest.approx([0.5, 0.6])


def test_hdf5_native_roundtrip(spark):
    """Pure-Python HDF5: contiguous, chunked, and gzip-chunked numeric
    datasets round-trip bit-exactly; unsupported features error
    loudly."""
    import numpy as np

    from vector_database_spark.sources.hdf5_native import (
        Hdf5FormatError,
        list_hdf5,
        read_hdf5_dataset,
        write_hdf5,
    )

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(5)
    train = rng.standard_normal((150, 8)).astype(np.float32)
    testq = rng.standard_normal((12, 8)).astype(np.float64)
    gt = np.arange(120, dtype=np.int32).reshape(12, 10)
    p = f"{tmp}/ann.hdf5"
    write_hdf5(p, {"train": train, "test": testq, "neighbors": gt})
    assert list_hdf5(p) == ["neighbors", "test", "train"]
    assert (read_hdf5_dataset(p, "train") == train).all()
    assert (read_hdf5_dataset(p, "test") == testq).all()
    assert (read_hdf5_dataset(p, "neighbors") == gt).all()

    p2 = f"{tmp}/chunked.hdf5"
    write_hdf5(p2, {"train": train}, chunks=41, gzip=6)
    assert (read_hdf5_dataset(p2, "train") == train).all()

    with pytest.raises(KeyError):
        read_hdf5_dataset(p, "missing")
    with pytest.raises(Hdf5FormatError):
        bad = f"{tmp}/bad.hdf5"
        open(bad, "wb").write(b"not an hdf5 file at all........")
        read_hdf5_dataset(bad, "train")


def test_hdf5_ann_benchmarks_flow(spark):
    """The reference's ann-benchmarks flow end-to-end WITHOUT h5py:
    hdf5 -> chunked staging -> parquet -> build -> search == brute
    (VectorIndex.MainTest/Program.cs:183-260)."""
    import numpy as np

    from vector_database_spark.operators.index_build import build_index
    from vector_database_spark.operators.search import (
        brute_force_search,
        search,
    )
    from vector_database_spark.sources.hdf5 import read_hdf5_vectors
    from vector_database_spark.sources.hdf5_native import write_hdf5

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(9)
    train = rng.uniform(-1, 1, (300, 6)).astype(np.float32)
    write_hdf5(f"{tmp}/data.hdf5", {"train": train}, chunks=128, gzip=4)

    vecs = read_hdf5_vectors(
        spark, f"{tmp}/data.hdf5", "train", f"{tmp}/staged", chunk_rows=100
    ).select("id", F.col("vector").cast("array<double>").alias("vector"))
    assert vecs.count() == 300
    idx = build_index(vecs, local_threshold=64)
    panel = [(3, [float(x) for x in train[3]]), (9, [float(x) for x in train[9]])]
    got = {(r.qid, r.id) for r in search(idx, vecs, panel, 0.8).collect()}
    want = {(r.qid, r.id) for r in brute_force_search(vecs, panel, 0.8).collect()}
    assert got == want and got


def test_multimodal_features(spark):
    media = sample_media(spark, n=12)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.feature) == 8
        assert r.n_bytes > 0
    # determinism: same payload -> same feature
    one = [r for r in rows if r.media_id == 0][0]
    local = fake_feature(
        media.where(F.col("media_id") == 0).collect()[0].payload
    )
    assert list(one.feature) == pytest.approx(local)


def test_multimodal_metadata_pruning(spark):
    """Metadata-only query must not deserialize payload bytes — check
    the parquet scan prunes the binary column (ReadSchema)."""
    media = sample_media(spark, n=6)
    tmp = tempfile.mkdtemp()
    media.write.parquet(f"{tmp}/media")
    scan = spark.read.parquet(f"{tmp}/media").select("media_id", "kind", "mime")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_resize_images_real_ppm(spark):
    """The image path is REAL for netpbm payloads: decode -> bilinear
    resize -> re-encode in mapInPandas; non-image rows pass through."""
    media = sample_media(spark, n=6)
    out = resize_images(media, width=8, height=8).collect()
    assert len(out) == 6
    for r in out:
        if r.kind == "image":
            assert (r.width, r.height) == (8, 8)
            arr = decode_ppm(bytes(r.payload))
            assert arr.shape == (8, 8, 3)
        else:
            assert bytes(r.payload)[:2] != b"P6"


def test_image_features_real(spark):
    media = sample_media(spark, n=6).where(F.col("kind") == "image")
    feats = extract_features(media, feature_fn=image_features)
    for r in feats.collect():
        assert len(r.feature) == 12
        assert all(0.0 <= x <= 1.0 for x in r.feature)


def test_resize_stub_raises(spark):
    # compressed formats without a codec still raise in decode_ppm
    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG...")


def test_json_vector_ingest(spark):
    df = spark.createDataFrame(
        [(1, "[0.1, 0.2, 0.3]"), (2, "[1.5, -2.0, 0.0]")],
        "id long, vector_json string",
    )
    parsed = ingest_json_vectors(df)
    rows = {r.id: list(r.vector) for r in parsed.collect()}
    assert rows[1] == pytest.approx([0.1, 0.2, 0.3], abs=1e-6)
    pts = explode_points(parsed)
    assert pts.count() == 6
    assert pts.where((F.col("id") == 2) & (F.col("idx") == 1)).collect()[0].value == -2.0


def test_wav_roundtrip_and_features(spark):
    import numpy as np

    from vector_database_spark.sources.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
        resample_audio,
    )

    rate = 8000
    t = np.arange(rate // 2) / rate
    stereo = np.stack(
        [
            np.rint(12000 * np.sin(2 * np.pi * 440 * t)),
            np.rint(8000 * np.sin(2 * np.pi * 220 * t)),
        ],
        axis=1,
    ).astype(np.int16)
    payload = encode_wav(stereo, rate)
    samples, r = decode_wav(payload)
    assert r == rate
    assert samples.shape == stereo.shape
    assert (samples == stereo).all()  # 16-bit PCM is lossless
    # spectral featurizer: a 440 Hz tone lands in band 0 of 8 over
    # [0, 4000] Hz; energies normalize to ~1
    f = audio_features(payload, n_bands=8)
    assert len(f) == 9
    assert f[0] > 0.9
    assert abs(sum(f[:8]) - 1.0) < 1e-3
    # resample halves the frame count (rate 8000 -> 4000)
    down = resample_audio(samples, rate, rate // 2)
    assert down.shape == (len(stereo) // 2, 2)


def test_y4m_roundtrip_and_frame_sampling(spark):
    import numpy as np

    from vector_database_spark.sources.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_frames,
        sample_media,
        video_features,
    )

    frames = np.zeros((3, 12, 16, 3), dtype=np.uint8)
    frames[0, :, :, 0] = 200  # red frame
    frames[1, :, :, 1] = 200  # green frame
    frames[2, :, :, 2] = 200  # blue frame
    payload = encode_y4m(frames, fps=10)
    dec, fps = decode_y4m(payload)
    assert fps == 10.0
    assert dec.shape == (3, 12, 16, 3)
    # C444 + BT.601 studio swing round-trips within quantization error
    assert int(np.abs(dec.astype(int) - frames.astype(int)).max()) <= 3
    feat = video_features(payload)
    assert len(feat) == 13

    # distributed frame sampling composes with the image operators
    media = sample_media(spark, n=9)  # 3 video rows, 4-7 frames each
    out = sample_frames(media, every=2).collect()
    assert all(bytes(r.payload)[:2] == b"P6" for r in out)
    assert all(r.frame_idx % 2 == 0 for r in out)
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    # videos are media_id 2, 5, 8 with 4+ (i%4) frames -> ceil(n/2) sampled
    assert set(by_media) == {2, 5, 8}
    for mid, rows in by_media.items():
        n_frames = 4 + (mid % 4)
        assert len(rows) == (n_frames + 1) // 2
    capped = sample_frames(media, every=1, max_frames=2)
    assert capped.groupBy("media_id").count().agg(F.max("count")).collect()[0][0] == 2


def test_y4m_c420_decode(spark):
    import numpy as np

    from vector_database_spark.sources.multimodal import decode_y4m

    # hand-build a C420 stream: 4x4 gray frame (Y=128, U=V=128)
    w = h = 4
    hdr = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n"
    frame = b"FRAME\n" + bytes([128] * (w * h)) + bytes([128] * 4) + bytes([128] * 4)
    dec, fps = decode_y4m(hdr + frame)
    assert dec.shape == (1, 4, 4, 3)
    # Y=128 studio swing -> ~130 in full range, all channels equal
    assert int(np.abs(dec[0].astype(int) - 130).max()) <= 1


def test_sample_media_real_payloads(spark):
    from vector_database_spark.sources.multimodal import (
        decode_wav,
        decode_y4m,
        sample_media,
    )

    rows = sample_media(spark, n=9).collect()
    for r in rows:
        raw = bytes(r.payload)
        if r.kind == "audio":
            samples, rate = decode_wav(raw)
            assert rate == 8000
            assert abs(r.duration_ms - 1000 * len(samples) / rate) < 1
        elif r.kind == "video":
            frames, fps = decode_y4m(raw)
            assert len(frames) >= 4 and fps == 10.0
            assert (r.width, r.height) == (16, 12)


def test_fvecs_roundtrip_distributed_read(spark):
    import numpy as np

    from vector_database_spark.sources.fvecs import read_vecs, write_vecs

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((1000, 16)).astype(np.float32)
    path = f"{tmp}/train.fvecs"
    assert write_vecs(path, vecs) == 1000
    # small chunk_rows forces a genuinely multi-task read
    df = read_vecs(spark, path, chunk_rows=128)
    rows = df.orderBy("id").collect()
    assert len(rows) == 1000
    assert rows[0].id == 0 and rows[-1].id == 999
    got = np.asarray([r.vector for r in rows], dtype=np.float32)
    assert (got == vecs).all()  # float32 round-trip is bit-exact


def test_ivecs_bvecs_and_errors(spark):
    import numpy as np
    import pytest as _pytest

    from vector_database_spark.sources.fvecs import read_vecs, write_vecs

    tmp = tempfile.mkdtemp()
    gt = np.arange(50 * 10, dtype=np.int32).reshape(50, 10)
    path = f"{tmp}/gt.ivecs"
    write_vecs(path, gt)
    rows = read_vecs(spark, path, chunk_rows=16).orderBy("id").collect()
    assert (np.asarray([r.vector for r in rows], dtype=np.int32) == gt).all()

    b = (np.arange(30 * 8) % 256).reshape(30, 8)
    bpath = f"{tmp}/base.bvecs"
    write_vecs(bpath, b)
    brows = read_vecs(spark, bpath).orderBy("id").collect()
    assert (np.asarray([r.vector for r in brows]) == b).all()

    # mixed dims are not splittable: loud error, not silent corruption
    mixed = f"{tmp}/mixed.fvecs"
    write_vecs(mixed, [np.zeros(4, np.float32), np.zeros(6, np.float32)])
    with _pytest.raises(ValueError, match="not a multiple"):
        read_vecs(spark, mixed)


def test_fvecs_feeds_index_build(spark):
    """The fvecs path composes with the engine end-to-end: read ->
    build -> exact search == brute (the ann-benchmarks flow the
    reference runs over HDF5)."""
    import numpy as np

    from vector_database_spark.operators.index_build import build_index
    from vector_database_spark.operators.search import brute_force_search, search
    from vector_database_spark.sources.fvecs import read_vecs, write_vecs

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(11)
    base = rng.uniform(-1, 1, (400, 8)).astype(np.float32)
    path = f"{tmp}/base.fvecs"
    write_vecs(path, base)
    vecs = read_vecs(spark, path, chunk_rows=100).select(
        "id", F.col("vector").cast("array<double>").alias("vector")
    )
    idx = build_index(vecs, local_threshold=64)
    panel = [(0, [float(x) for x in base[0]]), (7, [float(x) for x in base[7]])]
    got = {(r.qid, r.id) for r in search(idx, vecs, panel, 0.9).collect()}
    want = {(r.qid, r.id) for r in brute_force_search(vecs, panel, 0.9).collect()}
    assert got == want and got


def test_y4m_selective_decode(spark):
    import numpy as np

    from vector_database_spark.sources.multimodal import (
        decode_y4m,
        encode_y4m,
        y4m_frame_count,
    )

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (9, 8, 8, 3)).astype(np.uint8)
    payload = encode_y4m(frames, fps=5)
    assert y4m_frame_count(payload) == 9
    full, _ = decode_y4m(payload)
    sel, _ = decode_y4m(payload, frame_indices=[0, 4, 8])
    assert sel.shape[0] == 3
    assert (sel[0] == full[0]).all()
    assert (sel[1] == full[4]).all()
    assert (sel[2] == full[8]).all()


def test_jsonl_roundtrip_gzip(spark):
    import tempfile

    from vector_database_spark.sources.export import export_jsonl, read_jsonl

    df = spark.createDataFrame(
        [(1, "a b", ["x", "y"], 0.5), (2, "c", [], None)],
        "doc_id long, text string, tags array<string>, score double",
    )
    d = tempfile.mkdtemp() + "/jsonl"
    export_jsonl(df, d)
    back = read_jsonl(
        spark, d, "doc_id long, text string, tags array<string>, score double"
    )
    got = {(r.doc_id, r.text, tuple(r.tags or []), r.score) for r in back.collect()}
    want = {(1, "a b", ("x", "y"), 0.5), (2, "c", (), None)}
    assert got == want
    # gzip shards on disk
    import glob
    assert glob.glob(f"{d}/*.json.gz")


def test_review_regressions_multimodal_and_hdf5(spark):
    import numpy as np

    from vector_database_spark.sources.multimodal import (
        decode_y4m,
        encode_ppm,
        encode_y4m,
        sample_frames,
        y4m_frame_count,
    )

    # odd-dimension C420 headers are rejected loudly, not by a numpy
    # broadcast error
    bad = b"YUV4MPEG2 W15 H9 F25:1 Ip A1:1 C420\n" + b"FRAME\n" + b"\x00" * 203
    try:
        decode_y4m(bad)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "even dimensions" in str(e)
    # a truncated stream yields no frames from sample_frames instead
    # of aborting the job; frame_count refuses to count the torn frame
    frames = np.zeros((2, 4, 4, 3), np.uint8)
    good = encode_y4m(frames)
    torn = good[: len(good) - 5]
    try:
        y4m_frame_count(torn)
        assert False, "expected ValueError"
    except ValueError:
        pass
    media = spark.createDataFrame(
        [(1, "video", "video/x-y4m", bytearray(good), 4, 4, 80),
         (2, "video", "video/x-y4m", bytearray(torn), 4, 4, 80)],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
    out = sample_frames(media, every=1).collect()
    assert {r.media_id for r in out} == {1}
    assert len(out) == 2

    # truncated P6 passes through resize untouched
    from vector_database_spark.sources.multimodal import resize_images

    img = encode_ppm(np.zeros((4, 4, 3), np.uint8))
    imgs = spark.createDataFrame(
        [(1, "image", "image/x-ppm", bytearray(img), 4, 4, None),
         (2, "image", "image/x-ppm", bytearray(img[:10]), 4, 4, None)],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
    rs = {r.media_id: r for r in resize_images(imgs, width=2, height=2).collect()}
    assert rs[1].width == 2 and rs[2].width == 4
    assert bytes(rs[2].payload) == bytes(img[:10])


def test_hdf5_user_block_rebase(tmp_path):
    import numpy as np

    from vector_database_spark.sources.hdf5_native import (
        read_hdf5_dataset,
        write_hdf5,
    )

    p = tmp_path / "plain.h5"
    data = np.arange(24, dtype=np.float32).reshape(6, 4)
    write_hdf5(str(p), {"train": data})
    raw = p.read_bytes()
    # simulate a 512-byte user block: per spec all addresses become
    # relative to the superblock offset
    ub = tmp_path / "userblock.h5"
    ub.write_bytes(b"\x00" * 512 + raw)
    got = read_hdf5_dataset(str(ub), "train")
    assert np.array_equal(got, data)


def test_interval_join_right_outer_keeps_key(spark):
    from vector_database_spark.streaming.joins import interval_join

    imps = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    clicks = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00"),   # matched
         (2, "2024-01-01 00:05:00")],  # no impression -> outer row
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = interval_join(
        imps, clicks, on="user_id", left_ts="ts", right_ts="ts",
        within="10 minutes", how="rightOuter",
    ).collect()
    keys = {r.user_id for r in out}
    assert keys == {1, 2}  # the unmatched click keeps its real key


def test_rp_lsh_zero_vector_no_crash(spark):
    from vector_database_spark.operators.ann import rp_lsh_knn

    vecs = spark.createDataFrame(
        [(i, [float(i % 3) + 0.5, float(i % 5) - 1.0]) for i in range(30)]
        + [(99, [0.0, 0.0])],
        "id long, vector array<double>",
    )
    qdf = spark.createDataFrame(
        [(1, [1.5, 2.0])], "qid long, qvec array<double>"
    )
    res = rp_lsh_knn(vecs, qdf, k=5, dims=2, n_bits=2, n_tables=8, seed=3)
    rows = res.collect()
    assert len(rows) == 5
    # the zero vector never outranks a real candidate (dist 2.0 floor)
    assert all(r.id != 99 or r.cos_dist == 2.0 for r in rows)


def test_orc_roundtrip_partitioned(spark):
    import glob
    import tempfile

    from vector_database_spark.sources.export import export_orc, read_orc

    df = spark.createDataFrame(
        [
            (1, "a", [0.5, 1.0], "web"),
            (2, "b", [2.0], "wiki"),
            (3, None, None, "web"),
        ],
        "doc_id long, text string, vec array<double>, source string",
    )
    d = tempfile.mkdtemp() + "/orc"
    export_orc(df, d, partition_by=["source"])
    back = read_orc(spark, d)
    got = {
        (r.doc_id, r.text, tuple(r.vec or []), r.source)
        for r in back.collect()
    }
    want = {
        (1, "a", (0.5, 1.0), "web"),
        (2, "b", (2.0,), "wiki"),
        (3, None, (), "web"),
    }
    assert got == want
    assert glob.glob(f"{d}/source=web/*.orc")
    # partition pruning: only the matching directory is scanned
    plan = (
        read_orc(spark, d)
        .where("source = 'wiki'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "source=wiki" in plan or "PartitionFilters: [isnotnull(source" in plan


def test_frame_hash_dedup_planted_clones(spark):
    """Cross-video frame dedup: byte-identical clones must report
    dup_fraction 1.0; distinct synthetic videos share no frames."""
    from pyspark.sql import functions as F

    from vector_database_spark.sources.multimodal import (
        frame_hash_dedup,
        sample_media,
    )

    vids = sample_media(spark, n=12).where(F.col("kind") == "video")
    # distinct videos alone: no cross-video duplicates at all
    solo = {
        r["media_id"]: r["dup_fraction"]
        for r in frame_hash_dedup(vids, every=2).collect()
    }
    assert solo and all(v == 0.0 for v in solo.values())
    cloned = vids.unionByName(
        vids.withColumn("media_id", F.col("media_id") + F.lit(1000))
    )
    dup = {
        r["media_id"]: (r["dup_fraction"], r["n_frames"])
        for r in frame_hash_dedup(cloned, every=2).collect()
    }
    assert len(dup) == 2 * len(solo)
    assert all(f == 1.0 and n > 0 for f, n in dup.values())


def test_quantile_two_pass_matches_full_sort(spark):
    """The histogram-narrowed rank pick equals a brute full-sort rank
    pick for any q, including ties, tiny buckets, and the all-equal
    single-bucket degenerate key."""
    import random

    from vector_database_spark.operators.sketch import quantile_two_pass

    rng = random.Random(5)
    rows = []
    for i in range(600):
        rows.append((i, "a", rng.uniform(-10, 10)))
    for i in range(600, 650):
        rows.append((i, "b", 7.0))              # all-equal key
    for i in range(650, 700):
        rows.append((i, "c", float(i % 5)))     # heavy ties
    for i in range(700, 720):
        rows.append((i, "a", None))             # nulls must not shift ranks
    df = spark.createDataFrame(rows, "id long, k string, value double")
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = {
            r["k"]: (r["n"], r["v_lo"], r["v_hi"])
            for r in quantile_two_pass(
                df, value_col="value", q=q, key_cols=("k",), n_buckets=8
            ).collect()
        }
        vals = {}
        for _, k, v in rows:
            if v is not None:
                vals.setdefault(k, []).append(v)
        for k, vs in vals.items():
            vs = sorted(vs)
            n = len(vs)
            h = (n - 1) * q
            import math

            want = (n, vs[int(math.floor(h))], vs[int(math.ceil(h))])
            assert got[k] == want, (k, q, got[k], want)


def test_seeded_ppm_grid_sums_match_float_features(spark):
    """m04's integer grid sums are the exact face of image_features:
    psum/npix/255 must equal the float color-layout mean (same
    linspace patch boundaries), and the seeded corpus must decode
    through the REAL P6 path with the advertised dimensions."""
    from vector_database_spark.sources.multimodal import (
        image_features,
        image_grid_sums,
        seeded_ppm_media,
    )

    media = seeded_ppm_media(spark, n=6)
    rows = media.collect()
    assert len(rows) == 6
    feats = {}
    for r in rows:
        raw = bytes(r.payload)
        assert raw[:2] == b"P6"
        arr = decode_ppm(raw)
        assert arr.shape == (r.height, r.width, 3)
        feats[r.media_id] = image_features(raw, grid=2)

    sums = image_grid_sums(media, grid=2).collect()
    assert len(sums) == 6 * 4 * 3
    for r in sums:
        patch_idx = r.gy * 2 + r.gx
        want = feats[r.media_id][patch_idx * 3 + r.c]
        got = round(r.psum / r.npix / 255.0, 6)
        assert got == pytest.approx(want, abs=1e-6)


def test_quantile_sketch_contracts(spark):
    """Mergeable bottom-m quantile sketch: (1) partitioning-invariant
    (same state at 1 vs 13 partitions), (2) merge(split A, split B)
    == sketch(whole), (3) rank error vs the exact percentile within
    the sampling bound, (4) sample_n == min(m, n)."""
    import math

    from vector_database_spark.operators import sketch as sk

    rows = [(i, float((i * 7919) % 10007)) for i in range(5000)]
    df = spark.createDataFrame(rows, "rid long, value double")
    st1 = sk.quantile_sketch(df.repartition(1), id_col="rid", m=64)
    st13 = sk.quantile_sketch(df.repartition(13), id_col="rid", m=64)
    unpack = lambda d: [  # noqa: E731
        (r.n, list(r.hs), list(r.ids), list(r.vs)) for r in d.collect()
    ]
    assert unpack(st1) == unpack(st13)

    a = sk.quantile_sketch(df.where(F.col("rid") < 2500), id_col="rid", m=64)
    b = sk.quantile_sketch(df.where(F.col("rid") >= 2500), id_col="rid", m=64)
    merged = sk.quantile_sketch_merge(a.unionByName(b), m=64)
    assert unpack(merged) == unpack(st1)

    q = sk.quantile_sketch_query(st1, (0.5, 0.9)).first()
    assert q.n == 5000 and q.sample_n == 64
    vals = sorted(v for _, v in rows)
    for est, qq in ((q.p50, 0.5), (q.p90, 0.9)):
        true_rank = sum(1 for v in vals if v <= est) / len(vals)
        # sampling bound: ~2.5/sqrt(m) covers >5 sigma at m=64
        assert abs(true_rank - qq) <= 2.5 / math.sqrt(64), (qq, true_rank)


def test_kll_sketch_deterministic_and_bounded(spark):
    """Deterministic-compaction KLL: (1) identical state at any
    partitioning (hash-sharded feed + ordered merges), (2) rank error
    within the k-budget at every tested quantile, (3) state size
    O(k log(n/k)) — far under the data, (4) total item weight == n."""
    from vector_database_spark.operators.sketch import (
        kll_quantile,
        kll_sketch,
    )

    rows = [(i, float((i * 7919) % 100003)) for i in range(60000)]
    df = spark.createDataFrame(rows, "rid long, value double")
    s1 = kll_sketch(df.repartition(1), id_col="rid", k=200)
    s2 = kll_sketch(df.repartition(17), id_col="rid", k=200)
    assert s1 == s2 and s1["n"] == 60000
    assert sum(len(x) for x in s1["levels"]) < 2000
    assert (
        sum(len(x) * w for x, w in zip(s1["levels"], s1["weights"]))
        == 60000
    )
    vals = sorted(v for _, v in rows)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = kll_quantile(s1, q)
        rank = sum(1 for v in vals if v <= est) / len(vals)
        assert abs(rank - q) <= 0.03, (q, rank)


def test_hll_accuracy_and_merge(spark):
    """HLL contracts: (1) raw estimate within the 1.04/sqrt(m)
    standard error (x3) of the exact distinct count in the
    well-filled regime, (2) register merge == registers of the
    union (max is associative/commutative/idempotent),
    (3) partitioning-invariant."""
    import math

    from vector_database_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n_distinct = 20_000
    rows = [(i % n_distinct,) for i in range(40_000)]
    df = spark.createDataFrame(rows, "uid long")
    regs = hll_registers(df, value_col="uid", p=8)
    est = hll_estimate(regs, p=8).first()
    err = abs(float(est.estimate) - n_distinct) / n_distinct
    assert err <= 3 * 1.04 / math.sqrt(256), (est.estimate, err)
    # duplicates are invisible: distinct-only input gives the SAME regs
    regs_d = hll_registers(
        df.distinct().repartition(13), value_col="uid", p=8
    )
    unpack = lambda d: sorted(  # noqa: E731
        (r.bucket, r.reg) for r in d.collect()
    )
    assert unpack(regs) == unpack(regs_d)
    # split-merge == whole
    a = hll_registers(df.where(F.col("uid") % 2 == 0), value_col="uid", p=8)
    b = hll_registers(df.where(F.col("uid") % 2 == 1), value_col="uid", p=8)
    merged = hll_merge(a.unionByName(b))
    assert unpack(merged) == unpack(regs)


def test_bloom_filter_contracts(spark):
    """Zero false negatives, union-mergeability (bit_or of shard
    lanes == one-shot build), and a sane FP rate at the configured
    geometry."""
    from pyspark.sql import functions as F

    from vector_database_spark.operators import sketch as sk

    n, nb, k = 2000, 16384, 3
    keys = spark.range(n).select(F.col("id").alias("key"))
    filt = sk.bloom_build(keys, n_bits=nb, k=k)

    # mergeability: shard halves, bit_or lanes together
    a = sk.bloom_build(keys.where(F.col("key") < n // 2), n_bits=nb, k=k)
    b = sk.bloom_build(keys.where(F.col("key") >= n // 2), n_bits=nb, k=k)
    merged = (
        a.unionByName(b)
        .groupBy("lane", "n_bits", "k")
        .agg(F.bit_or("bits").alias("bits"))
        .select("lane", "bits", "n_bits", "k")
    )
    assert (
        merged.exceptAll(filt).count() == 0
        and filt.exceptAll(merged).count() == 0
    )

    probes = spark.range(2 * n).select(F.col("id").alias("key"))
    res = sk.bloom_probe(filt, probes, n_bits=nb, k=k)
    # carried-geometry contract (round-8 ADVICE): a mismatched
    # explicit geometry is refused, never silently false-negative
    import pytest as _pytest

    with _pytest.raises(ValueError, match="geometry"):
        sk.bloom_probe(filt, probes, n_bits=nb * 2, k=k)
    with _pytest.raises(ValueError, match="geometry"):
        sk.bloom_probe(filt, probes, k=k + 1)
    misses_in = res.where(
        (F.col("key") < n) & ~F.col("present")
    ).count()
    assert misses_in == 0  # no false negatives, ever
    fp = res.where((F.col("key") >= n) & F.col("present")).count()
    # (1 - e^(-kn/m))^k ~ 0.0326 at n=2000, m=16384, k=3; allow 3x
    assert fp / n < 0.10, fp
