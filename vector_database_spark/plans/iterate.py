"""Helpers for plan-external iteration (driver loops).

Spark has no recursion primitive for the tree build / tree search loops
(SURVEY.md §4), so those are driver-side `while` loops over DataFrame
jobs — the same structure as MLlib's iterative algorithms. The #1
failure mode is lineage growth: every level stacks projections/joins on
the last, and after ~20 levels analysis time dwarfs execution. We cut
lineage with `localCheckpoint` on a cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class LineageBudget:
    """Truncate a DataFrame's lineage every `every` ticks."""

    def __init__(self, every: int = 4):
        self.every = max(1, every)
        self._tick = 0

    def maybe_checkpoint(self, df: DataFrame) -> DataFrame:
        self._tick += 1
        if self._tick % self.every == 0:
            # Eager local checkpoint: materializes to executor-local
            # storage and severs lineage. On a real cluster with
            # unreliable executors you'd use reliable checkpoint() to a
            # DFS dir; local is the right trade in iterative builds.
            return df.localCheckpoint(eager=True)
        return df
