"""Property-based contracts for the codec/sketch surface added in
round 3: media codecs round-trip for ANY input in their domain, the
HDF5 writer/reader agree for ANY numeric array, histograms conserve
mass, stratified samples respect quotas and determinism. Codec
properties run driver-local (no Spark job) so examples are cheap."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra.numpy import arrays
from pyspark.sql import functions as F

from vector_database_spark.sources.multimodal import (
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
    y4m_frame_count,
)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    arr=arrays(
        np.uint8,
        st.tuples(st.integers(1, 12), st.integers(1, 12), st.just(3)),
    )
)
def test_ppm_roundtrip_any_image(arr):
    assert (decode_ppm(encode_ppm(arr)) == arr).all()


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    samples=arrays(
        np.int16, st.tuples(st.integers(1, 500), st.integers(1, 3))
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_pcm(samples, rate):
    got, r = decode_wav(encode_wav(samples, rate))
    assert r == rate
    assert got.shape == samples.shape
    assert (got == samples).all()


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    frames=arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 4), st.integers(1, 8), st.integers(1, 8), st.just(3)
        ),
    ),
    fps=st.integers(1, 60),
)
def test_y4m_roundtrip_any_video(frames, fps):
    payload = encode_y4m(frames, fps=fps)
    assert y4m_frame_count(payload) == frames.shape[0]
    dec, f = decode_y4m(payload)
    assert f == float(fps)
    assert dec.shape == frames.shape
    # C444 BT.601 studio-swing round-trip: bounded quantization error
    assert int(np.abs(dec.astype(int) - frames.astype(int)).max()) <= 3
    # selective decode equals positional slice of the full decode
    idxs = list(range(0, frames.shape[0], 2))
    sel, _ = decode_y4m(payload, frame_indices=idxs)
    assert (sel == dec[idxs]).all()


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    arr=arrays(
        st.sampled_from([np.float32, np.float64, np.int32, np.int64]),
        st.tuples(st.integers(1, 40), st.integers(1, 8)),
        elements=st.integers(-1000, 1000).map(float),
    ),
    chunks=st.one_of(st.none(), st.integers(1, 17)),
)
def test_hdf5_roundtrip_any_array(arr, chunks):
    from vector_database_spark.sources.hdf5_native import (
        read_hdf5_dataset,
        write_hdf5,
    )

    import tempfile

    p = tempfile.mkdtemp() + "/t.hdf5"
    write_hdf5(p, {"x": arr}, chunks=chunks,
               gzip=6 if chunks is not None else None)
    got = read_hdf5_dataset(p, "x")
    assert got.dtype == arr.dtype.newbyteorder("<")
    assert (got == arr).all()


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    vecs=arrays(
        st.sampled_from([np.float32, np.int32]),
        st.tuples(st.integers(1, 50), st.integers(1, 16)),
        elements=st.integers(-100, 100).map(float),
    )
)
def test_texmex_roundtrip_any_matrix(vecs):
    from vector_database_spark.sources.fvecs import _sniff, write_vecs

    kind = "fvecs" if vecs.dtype == np.float32 else "ivecs"
    import tempfile

    p = tempfile.mkdtemp() + f"/t.{kind}"
    write_vecs(p, vecs, kind=kind)
    dims, rec, n = _sniff(p, kind)
    assert (dims, n) == (vecs.shape[1], vecs.shape[0])
    # decode locally (the distributed read shares this layout)
    raw = np.fromfile(p, dtype=np.uint8).reshape(n, rec)
    body = raw[:, 4:].copy().view(vecs.dtype.newbyteorder("<"))
    assert (body == vecs).all()


def test_histogram_conserves_mass_and_bounds(spark):
    from vector_database_spark.operators.sketch import fixed_histogram

    df = spark.range(1000).select(
        ((F.col("id") * 37) % 101 - 17).cast("double").alias("v")
    )
    h = fixed_histogram(df, "v", lo=0.0, hi=50.0, n_bins=8).collect()
    assert sum(r.n for r in h) == 1000  # every non-null row lands somewhere
    for r in h:
        assert 0 <= r.bin <= 7
        assert r.lo_val <= r.hi_val
        if 0 < r.bin < 7:  # interior bins contain only in-range values
            assert r.lo_val >= 0.0 and r.hi_val < 50.0


def test_stratified_sample_quota_and_determinism(spark):
    from vector_database_spark.operators.sketch import stratified_sample

    df = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("k")
    )
    quotas = df.groupBy("g").agg(
        F.expr("least(count(1) div 10, 6)").alias("quota")
    )
    s1 = stratified_sample(df, ["g"], "k", quotas).collect()
    s2 = stratified_sample(df, ["g"], "k", quotas).collect()
    assert sorted((r.g, r.k) for r in s1) == sorted((r.g, r.k) for r in s2)
    by_g = {}
    for r in s1:
        by_g.setdefault(r.g, []).append(r.k)
    qmap = {r.g: r.quota for r in quotas.collect()}
    for g, ks in by_g.items():
        assert len(ks) == min(qmap[g], 500 // 7 + 1)
    # growth: the draw stays deterministic and quota-exact; survivors
    # change only by displacement from new lower-hash keys
    df2 = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("k")
    )
    s3 = stratified_sample(df2, ["g"], "k", quotas).collect()
    drawn3 = {(r.g, r.k) for r in s3}
    by_g3 = {}
    for r in s3:
        by_g3.setdefault(r.g, []).append(r.k)
    for g, ks in by_g3.items():
        assert len(ks) == qmap[g]
    assert len(drawn3) == sum(qmap.values())


def test_mad_outliers_crafted(spark):
    """Known median/MAD: group 'a' has med=10, MAD=1; only the
    planted 20.0 exceeds 3 MADs. A constant group (MAD=0) flags
    nothing, whatever its stragglers."""
    from vector_database_spark.operators.sketch import mad_outliers

    rows = [
        (1, "a", 9.0), (2, "a", 10.0), (3, "a", 11.0),
        (4, "a", 9.5), (5, "a", 10.5), (6, "a", 20.0),
        (7, "b", 5.0), (8, "b", 5.0), (9, "b", 5.0), (10, "b", 500.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_id"]: r for r in mad_outliers(df, k=3.0).collect()}
    # group a: med 10.25?? -> compute: sorted [9,9.5,10,10.5,11,20]
    # median = (10+10.5)/2 = 10.25; deviations sorted
    # [0.25,0.75,1.25,0.75,0.25,9.75] -> [0.25,0.25,0.75,0.75,1.25,9.75]
    # MAD = 0.75; 3*MAD = 2.25 -> only id 6 (dev 9.75)
    assert set(out) <= {6, 10}
    assert 6 in out
    assert round(out[6]["robust_z"], 4) == round(9.75 / 0.75, 4)
    # group b: med 5, MAD = median([0,0,0,495]) = 0 -> nothing flagged
    assert 10 not in out


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    planes=arrays(
        np.uint8,
        st.tuples(st.integers(1, 5), st.just(3), st.integers(1, 6),
                  st.integers(1, 6)),
    ),
)
def test_y4m_y_planes_extracts_exact_luma(planes):
    """y4m_y_planes returns byte-identical Y planes from a hand-built
    C444 container (header + FRAME markers + raw planar bytes)."""
    from vector_database_spark.sources.multimodal import y4m_y_planes

    nf, _, h, w = planes.shape
    parts = [b"YUV4MPEG2 W%d H%d F10:1 Ip A1:1 C444\n" % (w, h)]
    for fr in range(nf):
        parts.append(b"FRAME\n")
        parts.append(planes[fr].tobytes())
    gw, gh, got = y4m_y_planes(b"".join(parts))
    assert (gw, gh, len(got)) == (w, h, nf)
    for fr in range(nf):
        assert (got[fr].reshape(h, w) == planes[fr, 0]).all()
