"""Property-based oracle equivalence: for ANY vector set and ANY
query/domain, tree search must equal brute force exactly (the
reference's zero-FP/zero-FN contract, MemoryVectorIndexTests.cs:
198-204), for both physical strategies."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from vector_database_spark.operators.index_build import build_index
from vector_database_spark.operators.search import brute_force_search, search

_vec = st.lists(
    st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=3,
    max_size=3,
)

_dataset = st.lists(_vec, min_size=2, max_size=60)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(data=_dataset, qi=st.integers(0, 10_000), domain=st.sampled_from([0.05, 0.3, 0.9]))
def test_search_equals_bruteforce(spark, data, qi, domain):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "id long, vector array<float>"
    )
    idx = build_index(df, local_threshold=16)
    q = data[qi % len(data)]
    panel = [(0, [float(x) for x in q])]
    want = {r.id for r in brute_force_search(df, panel, domain).collect()}
    for strategy in ("broadcast", "iterative"):
        res = search(idx, df, panel, domain, strategy=strategy)
        got = {r.id for r in res.collect()}
        assert got == want, (strategy, sorted(got)[:5], sorted(want)[:5])
