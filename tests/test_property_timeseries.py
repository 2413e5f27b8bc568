"""Property-based contracts for the time-series/events family: the
funnel equals an independent pure-Python greedy reference on ANY
event stream; gapfill tiles the grid exactly and fills are consistent
with the observations; z-order codes are a bijection on a fully
covered grid."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from vector_database_spark.operators import layout
from vector_database_spark.operators import timeseries as ts

_STEPS = ["view", "click", "purchase"]

_event = st.tuples(
    st.integers(0, 3),                      # user
    st.integers(0, 2_000),                  # ts seconds
    st.sampled_from(_STEPS + ["other"]),    # type
)
_stream = st.lists(_event, min_size=1, max_size=40)


def _ref_funnel(rows, steps, within_s):
    """Independent greedy reference: anchored at the first step-1
    event per user; each step = first matching event strictly after
    (ts, id); first candidate past the deadline kills the chain."""
    by_user: dict = {}
    for eid, (u, t, et) in enumerate(rows):
        by_user.setdefault(u, []).append((t, eid, et))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        hits = [None] * len(steps)
        cur = None
        dead = False
        for t, eid, et in evs:
            if dead:
                break
            if cur is None:
                if et == steps[0]:
                    hits[0] = t
                    cur = (t, eid)
            else:
                depth = sum(1 for h in hits if h is not None)
                if depth >= len(steps):
                    break
                if et == steps[depth] and (t, eid) > cur:
                    if within_s is None or t <= hits[0] + within_s:
                        hits[depth] = t
                        cur = (t, eid)
                    else:
                        dead = True
        if hits[0] is not None:
            out[u] = tuple(hits)
    return out


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_stream, within=st.sampled_from([None, 100, 500]))
def test_funnel_matches_pure_python_reference(spark, rows, within):
    df = spark.createDataFrame(
        [(eid, u, t, et) for eid, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, ts_s long, event_type string",
    ).withColumn("ts", F.timestamp_micros(F.col("ts_s") * 1_000_000))
    got = {
        r["user_id"]: tuple(
            None if r[f"ts_step{i}"] is None
            else int(r[f"ts_step{i}"].timestamp())
            for i in (1, 2, 3)
        )
        for r in ts.funnel_steps(df, _STEPS, within_s=within).collect()
    }
    assert got == _ref_funnel(rows, _STEPS, within)


_obs = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
    min_size=1,
    max_size=12,
    unique_by=lambda o: o[0],
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(obs=_obs)
def test_gapfill_tiling_and_fill_consistency(spark, obs):
    """The grid is exactly the dense bucket range; observed buckets
    pass through; locf is the previous observation; interp at
    observed buckets equals the value and in gaps lies between the
    surrounding observations."""
    w = 60
    rows = [
        (i, b * w + 3, "k", float(v)) for i, (b, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s long, event_type string, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_s") * 1_000_000))
    level = ts.rollup_events(df, w, first_last=False)
    got = {
        r["bucket_s"]: r
        for r in ts.gapfill(level, w, value_col="sum_micros").collect()
    }
    buckets = sorted(b * w for b, _ in obs)
    assert sorted(got) == list(range(buckets[0], buckets[-1] + 1, w))
    vals = {b * w: v * 1_000_000 for b, v in obs}
    last = None
    for b in sorted(got):
        r = got[b]
        if b in vals:
            assert r["value"] == vals[b] == r["value_interp"]
            last = vals[b]
        else:
            assert r["value"] is None
            assert r["value_locf"] == last
            prevs = [x for x in vals if x < b]
            nxts = [x for x in vals if x > b]
            if prevs and nxts:
                lo_v, hi_v = sorted((vals[max(prevs)], vals[min(nxts)]))
                assert lo_v <= r["value_interp"] <= hi_v
            else:
                assert r["value_interp"] is None


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_zorder_bijective_on_covered_grid(spark, pts):
    """With bounds exactly covering the grid, the interleave is a
    bijection: decoding the bits recovers every point."""
    bits = 4
    df = spark.createDataFrame(pts, "a long, b long")
    out = layout.zorder_code(
        df, ["a", "b"], bits=bits, bounds={"a": (0, 15), "b": (0, 15)}
    ).collect()
    for r in out:
        z = r["zcode"]
        a = sum(((z >> (2 * i)) & 1) << i for i in range(bits))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(bits))
        assert (a, b) == (r["a"], r["b"])


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    ),
    chunk=st.sampled_from([1, 2, 3, 7, 100]),
    alpha=st.sampled_from([0.25, 0.5, 0.9]),
)
def test_ewma_chunked_equals_replay_any_chunking(spark, vals, chunk, alpha):
    """The bounded two-stage EWMA is BIT-IDENTICAL to the pure-Python
    replay of its fixed chunking scheme for ANY values, chunk size,
    and alpha — the determinism contract e07's recursive-CTE oracle
    relies on."""
    rows = [(i, 1, i * 10, v) for i, v in enumerate(vals, start=1)]
    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_s long, value double"
        )
        .withColumn("ts", F.timestamp_micros(F.col("ts_s") * 1_000_000))
        .drop("ts_s")
    )
    out = ts.ewma(df, alpha=alpha, chunk_rows=chunk).collect()
    assert len(out) == 1 and out[0]["n_events"] == len(vals)

    chunks = [vals[i : i + chunk] for i in range(0, len(vals), chunk)]
    acc = None
    for ci, c in enumerate(chunks):
        if ci == 0:
            acc = c[0]
            for x in c[1:]:
                acc = acc * (1.0 - alpha) + x * alpha
        else:
            a, b = 1.0, 0.0
            for x in c:
                a = a * (1.0 - alpha)
                b = b * (1.0 - alpha) + x * alpha
            acc = acc * a + b
    assert out[0]["ewma"] == acc
