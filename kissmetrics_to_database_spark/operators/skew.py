"""Skew mitigation: salting for hot keys (SURVEY.md §4 scale notes).

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; explicit salting remains the tool when (a) a *broadcast*
isn't possible and one key dominates a shuffle join, or (b) a
groupBy key is so hot a single reducer becomes the straggler.

Both helpers are deterministic (salt = hash of the row's other
columns, not a random number) so results are reproducible and
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) left side.

    The left side gets a deterministic salt derived from its other
    columns; the right side is replicated ``num_salts`` times. The
    join key becomes (key, salt), spreading a hot key over
    ``num_salts`` reducers. Right-side replication cost is
    num_salts × |right| — use when |right| is modest but above the
    broadcast threshold.

    Supported ``how``: inner/left/left_outer — under right/full outer
    joins the replicated right side would emit unmatched rows once
    per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: a "
            "replicated right side duplicates unmatched rows under "
            "right/full outer semantics"
        )
    other_cols = [c for c in left.columns if c != on]
    # key-only left frames have nothing else to hash; salting by the
    # key alone is degenerate (one salt per key) but stays correct
    salt_src = other_cols if other_cols else [on]
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(num_salts))
    l_salted = left.withColumn(SALT_COL, salt)
    r_replicated = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return l_salted.join(r_replicated, [on, SALT_COL], how).drop(SALT_COL)


def salted_agg_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    num_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial
    count/sum on (key, salt), then final combine on key. (For
    algebraic aggregates Spark's map-side combine already does this
    per partition; the explicit form also spreads the *reduce* side,
    which matters when one key owns most rows.)"""
    salt = F.pmod(F.hash(F.col(value)), F.lit(num_salts))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.round(F.sum("_s"), 2).alias("total")
    )


def key_skew_report(
    df: DataFrame,
    cols: list[str],
    top_n: int = 3,
) -> DataFrame:
    """Shuffle-planning diagnostic: per candidate key column, the
    numbers that decide between plain shuffle / AQE / salting /
    broadcast — distinct-key count, the hottest key's share of all
    rows, the skew ratio (hottest / mean bucket), and the top keys.

    Interpretation: ``top_share`` ≈ 1/parallelism means one reducer
    owns that fraction of the shuffle regardless of partition count —
    the signal to salt (salted_join / salted_agg_count_sum) or
    broadcast the other side. ``skew_ratio`` near 1 = uniform.

    One hash aggregation per column (map-side combined), top keys via
    a bounded sort inside the (column-count-sized) aggregate — output
    is one row per audited column, driver-scale.
    """
    spark = df.sparkSession
    outs = []
    for c in cols:
        counts = (
            df.select(F.col(c).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        top = (
            counts.orderBy(F.desc("n"), "k")
            .limit(top_n)
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    (-F.col("n")).alias("nn"), F.col("k")
                                )
                            )
                        ),
                        lambda s: s["k"],
                    ),
                ).alias("top_keys")
            )
        )
        stats = counts.agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_bucket"),
        )
        outs.append(
            stats.crossJoin(top).select(
                F.lit(c).alias("key_column"),
                "n_distinct",
                "n_rows",
                F.round(F.col("max_bucket") / F.col("n_rows"), 6).alias(
                    "top_share"
                ),
                F.round(
                    F.col("max_bucket")
                    * F.col("n_distinct")
                    / F.col("n_rows"),
                    6,
                ).alias("skew_ratio"),
                "top_keys",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
