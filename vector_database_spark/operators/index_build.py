"""Level-synchronous BSP-tree index build.

Semantics (must match the reference — SURVEY.md §1.3):

* heap numbering: root range 0, children ``2r+1`` (low) / ``2r+2``
  (high) — DDL.sql:120,147,195-196; IndexBuilder.cs:99-104;
* split dimension: per-range argmax of stdev on even depths, argmin on
  odd depths (DDL.sql:91-92,151; IndexBuilder.cs:75-79), deterministic
  lowest-idx tie-break (the C# ``MaxBy`` picks the first extremum);
* split point: the mean of that dimension (DDL.sql:100,162-163);
* routing: value < mid → low, value > mid → high, tie → compare the
  point id against the range's mean id (``id <= mean_id`` → low) —
  DDL.sql:161-167, IndexBuilder.cs:115. The mean id is the *truncated*
  integer mean (T-SQL integer avg; C# Int128 division);
* degenerate split (chosen stdev == 0, i.e. all values equal in every
  informative sense): ``dimension``/``mid`` null, route purely by id
  (DDL.sql:100,190-193) — search then descends both children;
* leaf (count == 1): child ids null, ``id`` set (DDL.sql:190-199).

Execution strategy (Spark-first, NOT the reference's sequential DFS —
README.md:93-100 rationale inverted, see SURVEY.md §4):

1. *Distributed phase*: one DataFrame job per tree level. Per-dimension
   stats for every open range in ONE aggregation
   (``groupBy(doc_id, range_id, idx)`` after ``posexplode`` — partial
   map-side combine keeps the shuffle tiny: #ranges × dims rows).
   The per-range split choice is collected to the driver (≤ a few
   hundred open ranges once deep) and re-broadcast as a join table, so
   point routing is a broadcast join + ``element_at`` — the big points
   table is never shuffled during routing.
2. *Local phase*: once a range holds ≤ ``local_threshold`` points its
   whole subtree is built inside one task via ``applyInPandas`` (same
   trick as MLlib decision trees). This bounds the driver loop to
   ~log2(N/threshold) levels regardless of data size.

At 100 TB: phase 1 runs ~log2(rows/threshold) ≈ 15-25 levels, each a
narrow scan + tiny shuffle; phase 2 is embarrassingly parallel across
ranges. No stage ever materializes per-node state on the driver beyond
the open-range split table.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.plans.iterate import LineageBudget

_MAX_RANGE_ID = 1 << 62

INDEX_COLS = [
    "doc_id",
    "range_id",
    "dimension",
    "mid",
    "low_range_id",
    "high_range_id",
    "id",
]

_INDEX_DDL = (
    "doc_id long, range_id long, dimension int, mid double, "
    "low_range_id long, high_range_id long, id long"
)


def _depth_of(range_id: int) -> int:
    """Tree depth of a heap-numbered range (root 0 → depth 0)."""
    return (range_id + 1).bit_length() - 1


@dataclass
class _LevelPlan:
    leaves: list[tuple]  # (doc, rid, id)
    local_rids: list[tuple]  # (doc, rid) going to the pandas subtree phase
    splits: list[tuple]  # (doc, rid, dim|None, mid|None, mean_id)

    @property
    def done(self) -> bool:
        return not self.splits


def build_index(
    df: DataFrame,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    doc_col: str | None = None,
    local_threshold: int = 20_000,
    checkpoint_every: int = 4,
    max_levels: int = 62,
) -> DataFrame:
    """Build the BSP-tree index over ``df`` (one tree per document if
    ``doc_col`` given). Returns the index DataFrame
    ``(doc_id, range_id, dimension, mid, low_range_id, high_range_id, id)``.
    """
    spark = df.sparkSession
    doc_expr = F.col(doc_col) if doc_col else F.lit(0).cast("long")
    pts = df.select(
        doc_expr.cast("long").alias("doc_id"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vector_col).alias("vector"),
        F.lit(0).cast("long").alias("range_id"),
    )

    budget = LineageBudget(checkpoint_every)
    driver_rows: list[tuple] = []  # finished index rows (leaves + split nodes)
    local_pool: list[DataFrame] = []  # point sets handed to the pandas phase
    depth = 0

    while True:
        if depth > max_levels:
            raise RuntimeError(
                f"build_index exceeded {max_levels} distributed levels — "
                "pathological split sequence (range ids would overflow)"
            )
        plan = _plan_level(pts, depth, local_threshold)
        driver_rows.extend(
            (doc, rid, None, None, None, None, pid) for doc, rid, pid in plan.leaves
        )
        driver_rows.extend(
            (
                doc,
                rid,
                dim,
                mid,
                2 * rid + 1,
                2 * rid + 2,
                None,
            )
            for doc, rid, dim, mid, _mean_id in plan.splits
        )
        if plan.local_rids:
            keys = spark.createDataFrame(
                plan.local_rids, "doc_id long, range_id long"
            )
            local_pool.append(
                pts.join(F.broadcast(keys), ["doc_id", "range_id"], "left_semi")
            )
        if plan.done:
            break

        for _doc, rid, *_ in plan.splits:
            if 2 * rid + 2 > _MAX_RANGE_ID:
                raise RuntimeError("range id overflow — tree too deep")

        splits_df = spark.createDataFrame(
            plan.splits,
            "doc_id long, range_id long, split_dim int, mid double, mean_id long",
        )
        v = F.try_element_at(F.col("vector"), F.col("split_dim") + F.lit(1)).cast(
            "double"
        )
        go_low = F.when(
            F.col("split_dim").isNull(), F.col("id") <= F.col("mean_id")
        ).otherwise(
            (v < F.col("mid"))
            | ((v == F.col("mid")) & (F.col("id") <= F.col("mean_id")))
        )
        pts = (
            pts.join(F.broadcast(splits_df), ["doc_id", "range_id"], "inner")
            .withColumn(
                "range_id",
                F.col("range_id") * 2 + F.when(go_low, F.lit(1)).otherwise(F.lit(2)),
            )
            .select("doc_id", "id", "vector", "range_id")
        )
        pts = budget.maybe_checkpoint(pts)
        depth += 1

    parts: list[DataFrame] = []
    if driver_rows:
        parts.append(spark.createDataFrame(driver_rows, _INDEX_DDL))
    if local_pool:
        pool = local_pool[0]
        for extra in local_pool[1:]:
            pool = pool.unionByName(extra)
        parts.append(
            pool.groupBy("doc_id", "range_id").applyInPandas(
                _make_subtree_builder(), schema=_INDEX_DDL
            )
        )
    if not parts:
        return spark.createDataFrame([], _INDEX_DDL)
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def _plan_level(pts: DataFrame, depth: int, local_threshold: int) -> _LevelPlan:
    """Plan one level in two aggregates:

    1. a cheap count pass over the un-exploded points decides each
       range's fate (leaf / local subtree / distributed split);
    2. the expensive per-dimension stats aggregate (posexplode, dims×
       the data) runs ONLY over ranges that actually split — at the
       late levels most ranges fall under the local threshold and the
       stats pass touches nothing.

    Mirrors DDL.sql:118-152 decorrelated: all splitting ranges share
    one groupBy + one window argmax.
    """
    spark = pts.sparkSession
    counts = (
        pts.groupBy("doc_id", "range_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("id").alias("min_id"))
        .collect()
    )
    plan = _LevelPlan(leaves=[], local_rids=[], splits=[])
    big: list[tuple] = []
    for r in counts:
        if r.cnt == 1:
            # the single point's id IS min(id) — no extra lookup.
            plan.leaves.append((r.doc_id, r.range_id, r.min_id))
        elif r.cnt <= local_threshold:
            plan.local_rids.append((r.doc_id, r.range_id))
        else:
            big.append((r.doc_id, r.range_id))
    if not big:
        return plan

    big_df = F.broadcast(
        spark.createDataFrame(big, "doc_id long, range_id long")
    )
    exploded = pts.join(big_df, ["doc_id", "range_id"], "left_semi").select(
        "doc_id", "range_id", "id", F.posexplode("vector").alias("idx", "value")
    )
    stats = exploded.groupBy("doc_id", "range_id", "idx").agg(
        F.avg(F.col("value").cast("double")).alias("mean"),
        F.var_pop(F.col("value").cast("double")).alias("var"),
        # Truncated integer mean id (T-SQL integer avg / C# Int128
        # division both floor for non-negative ids); decimal(38,0) sum
        # is overflow-safe (Stats.cs:26 uses Int128 for the same
        # reason). floor(), NOT a decimal cast — decimal casts round
        # half-up, which can empty a child on an id-split of two
        # consecutive ids.
        F.floor(F.sum(F.col("id").cast("decimal(38,0)")) / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_id"),
    )
    # argmax stdev on even depths, argmin on odd (DDL.sql:151); ties to
    # the lowest dimension index, like C# MaxBy's first-extremum.
    order = F.col("var").desc() if depth % 2 == 0 else F.col("var").asc()
    w = Window.partitionBy("doc_id", "range_id").orderBy(order, F.col("idx").asc())
    chosen = (
        stats.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "range_id", "idx", "mean", "var", "mean_id")
        .collect()
    )
    for r in chosen:
        if r.var == 0.0:
            plan.splits.append((r.doc_id, r.range_id, None, None, r.mean_id))
        else:
            plan.splits.append((r.doc_id, r.range_id, r.idx, r.mean, r.mean_id))
    return plan


def _make_subtree_builder():
    """Return the per-range subtree builder for `applyInPandas`.

    Deliberately a *nested, self-contained* function: cloudpickle
    serializes closures by value, so executors never need this package
    on their PYTHONPATH (no --py-files required on a real cluster).

    Identical split semantics to the distributed phase; an explicit
    stack like the reference's out-of-core walker
    (IndexBuilder.cs:23-157) but over an in-memory numpy matrix.
    """
    max_range_id = _MAX_RANGE_ID
    cols = list(INDEX_COLS)

    def build_subtree(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as _pd

        doc = int(pdf["doc_id"].iloc[0])
        root = int(pdf["range_id"].iloc[0])
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["vector"]],
            dtype=np.float64,
        )
        n_total = len(ids)
        big_ids = bool(n_total) and int(ids.max()) > (1 << 45)

        out: list[tuple] = []
        # Level-synchronous build with per-level compaction: the
        # working arrays hold only ACTIVE (multi-point) segments,
        # contiguously tiled, so one np.add.reduceat per level yields
        # every node's sums/sq-sums (reduceat sums start->next start —
        # valid exactly because finished leaves are compacted away and
        # coverage stays gapless). Per-node Python is ~6 ops; the
        # heavy lifting is C loops. Same split semantics as the
        # distributed phase.
        P = mat
        Ii = ids
        segs: list[tuple[int, int, int]] = [(root, 0, n_total)]  # (rid, a, b)

        while segs:
            starts = np.fromiter((a for _, a, _ in segs), dtype=np.int64)
            sums = np.add.reduceat(P, starts, axis=0)
            sqs = np.add.reduceat(P * P, starts, axis=0)
            counts = np.fromiter((b - a for _, a, b in segs), dtype=np.int64)
            means = sums / counts[:, None]
            # E[x^2] - m^2 (clamped): cheap one-pass variance. Tiny
            # residues on (near-)constant data are handled by the
            # empty-side guard below, which degrades to the id-split.
            vars = np.maximum(sqs / counts[:, None] - means * means, 0.0)
            if big_ids:
                id_sums = [sum(int(x) for x in Ii[a:b]) for _, a, b in segs]
            else:
                id_sums = np.add.reduceat(Ii, starts)

            blocks_P: list = []
            blocks_I: list = []
            next_segs: list[tuple[int, int, int]] = []
            pos = 0
            for k, (rid, a, b) in enumerate(segs):
                cnt = b - a
                if cnt == 1:  # defensive: only possible for a 1-row group
                    out.append((doc, rid, None, None, None, None, int(Ii[a])))
                    continue
                depth = (rid + 1).bit_length() - 1
                v = vars[k]
                dim = int(np.argmax(v)) if depth % 2 == 0 else int(np.argmin(v))
                mean_id = int(id_sums[k]) // cnt
                low_rid, high_rid = 2 * rid + 1, 2 * rid + 2
                if high_rid > max_range_id:
                    raise RuntimeError("range id overflow in local subtree build")
                seg_ids = Ii[a:b]
                low_mask = None
                if v[dim] != 0.0:
                    mid = float(means[k, dim])
                    vals = P[a:b, dim]
                    low_mask = (vals < mid) | ((vals == mid) & (seg_ids <= mean_id))
                    nlo = int(low_mask.sum())
                    if nlo == 0 or nlo == cnt:
                        # one-pass variance left a tiny positive residue
                        # on (near-)constant data AND the float mean sits
                        # an ulp off every value — no tie-break fires.
                        # Degrade to the id-split the exact-variance path
                        # would have taken.
                        low_mask = None
                if low_mask is None:
                    out.append((doc, rid, None, None, low_rid, high_rid, None))
                    low_mask = seg_ids <= mean_id
                else:
                    out.append((doc, rid, dim, mid, low_rid, high_rid, None))
                for child_rid, mask in ((low_rid, low_mask), (high_rid, ~low_mask)):
                    c = int(mask.sum())
                    if c == 1:
                        out.append(
                            (doc, child_rid, None, None, None, None, int(seg_ids[mask][0]))
                        )
                        continue
                    blocks_P.append(P[a:b][mask])
                    blocks_I.append(seg_ids[mask])
                    next_segs.append((child_rid, pos, pos + c))
                    pos += c
            if next_segs:
                P = np.concatenate(blocks_P, axis=0)
                Ii = np.concatenate(blocks_I)
            segs = next_segs

        res = _pd.DataFrame(out, columns=cols)
        for c in ("low_range_id", "high_range_id", "id"):
            res[c] = res[c].astype("Int64")
        res["doc_id"] = res["doc_id"].astype("int64")
        res["range_id"] = res["range_id"].astype("int64")
        res["mid"] = res["mid"].astype("float64")
        res["dimension"] = res["dimension"].astype("Int32")
        return res

    return build_subtree
