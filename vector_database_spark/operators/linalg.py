"""Distributed linear algebra over the embedding corpus: exact
fixed-point Gram matrix + PCA power iteration.

The missing dimensionality-reduction primitive: the dominant
principal direction of the (uncentered) embedding corpus, computed
the way a 100 TB pipeline must — ONE distributed pass builds the
dims x dims Gram matrix (the only corpus-sized work; everything after
is O(dims^2) on the driver) — and the way this repo's correctness
bar demands — EXACT integer arithmetic end to end, so a DuckDB
oracle replays the distributed aggregation AND the iteration
bit-for-bit (v18; the g03 fixed-point-PageRank pattern applied to
linear algebra).

Exactness design:
* values quantize to micro-units (floor(x * 1e6) — the repo's
  fixed-point rule), so Gram entries are INTEGER sums
  (DECIMAL(38,0) / HUGEINT): associative, order-free, engine-equal.
* the power iteration runs over integer vectors with a
  TRUNCATING-division renormalization each step
  (sign(w) * (|w| * scale div max|w|)) — truncation, not floor,
  because DuckDB's ``//`` truncates toward zero and the oracle must
  replay each step exactly; magnitudes stay bounded by `scale` so a
  HUGEINT never overflows (|G| < 1e38 headroom checked below).
* iterations unroll as chained CTEs in the oracle (recursive CTEs
  cannot aggregate — the g03 lesson).

Scale shape: the Gram pass explodes each row to its dims entries and
self-joins per row id — dims^2 products per row, ONE map-side
combinable aggregate of dims^2 cells; for dims beyond ~100s switch
to a mapInPandas partial-Gram kernel (numpy outer products carried
as Python big-ints per partition). The iteration itself never
touches the cluster again.

Reference analog: O17's one-pass moments (VectorStatistics.cs)
generalized from per-dimension variance to the full second-moment
matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def gram_matrix(
    vecs: DataFrame,
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    scale: int = MICROS,
) -> DataFrame:
    """(i, j, g): the exact integer Gram matrix of the quantized
    corpus, g = sum over rows of vm_i * vm_j with
    vm = floor(x * scale) — DECIMAL(38,0) sums, cast BEFORE the
    multiply (the repo overflow rule)."""
    vm = F.transform(
        F.col(vector_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(int(scale))).cast("long"),
    )
    rows = vecs.select(F.col(id_col).alias("_id"), vm.alias("_vm"))
    a = rows.select("_id", F.posexplode("_vm").alias("i", "vi"))
    b = rows.select("_id", F.posexplode("_vm").alias("j", "vj"))
    return (
        a.join(b, "_id")
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.col("vi").cast("decimal(38,0)") * F.col("vj")
            ).alias("g")
        )
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//``
    semantics, which Python's floor ``//`` does NOT match for
    negative numerators."""
    q = abs(a) // b
    return q if a >= 0 else -q


def pca_power_fixedpoint(
    vecs: DataFrame,
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    squarings: int = 6,
    scale: int = MICROS,
) -> list[int]:
    """Dominant principal direction as a fixed-point integer vector
    (components in [-scale, scale], max |component| == scale), by
    RENORMALIZED REPEATED SQUARING: normalize the Gram matrix to
    fixed point, square it ``squarings`` times (renormalizing by the
    max |entry| after each — truncating division, DuckDB's //
    semantics), then one matrix-vector product against the all-ones
    vector. Equivalent in direction to 2^squarings plain power
    iterations (default 64 — enough for the slow lambda2/lambda1
    ~0.93 spectra of near-uniform corpora) but costs only
    ``squarings`` O(dims^3) integer multiplies, which keeps the
    oracle's unrolled-CTE replay small AND fast (a 64-step unrolled
    matvec chain made DuckDB recompute/inline itself into minutes).
    Fully deterministic — every multiply, add, and truncation is
    replayed bit-for-bit by v18's oracle. Magnitude bound: entries
    stay <= scale after each renormalization, so an intermediate is
    <= dims * scale^2 * scale — far inside HUGEINT."""
    g_rows = gram_matrix(
        vecs, vector_col=vector_col, id_col=id_col, scale=scale
    ).collect()
    dims = max(r["i"] for r in g_rows) + 1
    S = int(scale)
    G = [[0] * dims for _ in range(dims)]
    for r in g_rows:
        G[r["i"]][r["j"]] = int(r["g"])

    def renorm_mat(M):
        m = max(abs(x) for row in M for x in row)
        if m == 0:
            return M
        return [[_trunc_div(x * S, m) for x in row] for row in M]

    A = renorm_mat(G)
    for _ in range(int(squarings)):
        H = [
            [
                sum(A[i][k] * A[k][j] for k in range(dims))
                for j in range(dims)
            ]
            for i in range(dims)
        ]
        A = renorm_mat(H)
    w = [sum(A[i][j] * S for j in range(dims)) for i in range(dims)]
    m = max(abs(x) for x in w)
    if m == 0:
        return w
    return [_trunc_div(x * S, m) for x in w]
