"""Robust numeric feature conditioning for ML feature pipelines.

Raw event `value` columns are heavy-tailed (purchases mix cents with
enterprise invoices); feeding them to a model without conditioning
makes the tail dominate every gradient. The standard treatment is
winsorize (clamp to [p05, p95]) + robust z-score ((x − median) / IQR)
— both quantile-based, so outliers influence neither the center nor
the spread estimate, unlike mean/stddev scaling.

Scale shape: quantiles are ONE exact-percentile aggregation per
group (Spark's `percentile` — a single shuffle, map-side partial
histograms), broadcast back onto the stream as a tiny per-group
table. The scoring pass is then map-only. At 100 TB the group count
(event types, feature names) is small; the stream is never windowed
or sorted. Percentiles round to 6 dp BEFORE use on both engines so
the clamp/score arithmetic is engine-exact (interpolation ulps never
leak into results).

Reference anchor: none (the reference loads raw values verbatim,
KissmetricsToDatabase.php:284-300) — training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.05, 0.25, 0.5, 0.75, 0.95),
    ndigits: int = 6,
) -> DataFrame:
    """Per-group exact linear-interpolation percentiles, rounded.

    Returns (group, q_05, q_25, ... ) — one narrow row per group,
    suitable for broadcasting back onto the fact stream.
    """
    arr = F.expr(
        f"percentile(`{value_col}`, array({', '.join(map(str, probs))}))"
    )
    cols = [
        F.round(arr.getItem(i), ndigits).alias(
            "q_" + str(p).replace("0.", "").ljust(2, "0")
        )
        for i, p in enumerate(probs)
    ]
    return df.where(F.col(value_col).isNotNull()).groupBy(group_col).agg(
        *cols
    )


def robust_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Winsorize to [p05, p95] and robust-z within each group.

    Adds `value_w` (clamped), `rz` ((value_w − median) / IQR, null
    when the group's IQR is 0), `clipped` (-1 low / 0 no / +1 high).
    Null values pass through with null scores.
    """
    q = group_quantiles(df, group_col, value_col)
    v = F.col(value_col)
    # least/greatest SKIP nulls (Spark and DuckDB both follow the
    # Postgres rule), so a bare clamp would map a NULL value to q_05;
    # gate on isNotNull so nulls pass through as the docstring says.
    clamped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("q_05")), F.col("q_95"))
    )
    iqr = F.col("q_75") - F.col("q_25")
    return (
        df.join(F.broadcast(q), group_col, "left")
        .withColumn("value_w", clamped)
        .withColumn(
            "rz",
            F.when(
                iqr > 0, F.round((clamped - F.col("q_50")) / iqr, ndigits)
            ),
        )
        .withColumn(
            "clipped",
            F.when(v.isNull(), F.lit(None).cast("int"))
            .when(v < F.col("q_05"), -1)
            .when(v > F.col("q_95"), 1)
            .otherwise(0),
        )
        .drop("q_05", "q_25", "q_50", "q_75", "q_95")
    )
