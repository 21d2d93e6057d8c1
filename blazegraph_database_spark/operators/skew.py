"""Skew-mitigation helpers (SURVEY.md §6).

AQE's skew-join handles most cases at runtime; these helpers cover the
patterns AQE can't fix: aggregations over power-law keys (PageRank hubs,
boilerplate LSH buckets) and broadcast-infeasible skewed joins.

`salted_groupby_agg` implements two-phase aggregation: group on
(key, salt) first — spreading a hot key over `salts` reducers — then
combine partials. Works for any algebraic aggregate (sum/count/min/max).

`salted_join` replicates the small side `salts` times so a skewed big-side
key spreads across `salts` partitions instead of one straggler task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform pseudo-random salt in [0, salts) — derived from the row via
    xxhash64 of all columns (stateless, no RNG nondeterminism)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(col_name, F.pmod(h, F.lit(salts)).cast("int"))


def salted_groupby_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: [(out_name, fn, col)] with fn in {sum, count, min, max}.
    Phase 1 aggregates per (key, salt); phase 2 combines partials —
    count partials combine with sum.
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    salted = with_salt(df, salts)
    p1 = salted.groupBy(key, "_salt").agg(
        *[first[fn](col if fn != "count" else "_salt").alias(out) for out, fn, col in aggs]
    )
    return p1.groupBy(key).agg(*[combine[fn](out).alias(out) for out, fn, _ in aggs])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt). Total small-side size
    multiplies by `salts` — use when broadcast doesn't fit but a few hot
    keys dominate the big side."""
    big_s = with_salt(big, salts)
    rep = small.crossJoin(
        small.sparkSession.range(salts).select(F.col("id").cast("int").alias("_salt"))
    )
    out = big_s.join(rep, on=[on, "_salt"], how=how)
    return out.drop("_salt")
