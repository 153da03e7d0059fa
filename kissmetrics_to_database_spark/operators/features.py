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


def ewma_forecast_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    alpha: float = 0.3,
    horizon: int = 8,
    ratio_hi: float = 2.0,
    ratio_lo: float = 0.5,
) -> DataFrame:
    """EWMA forecast-residual anomaly monitor over hourly rates — the
    trend-following complement to the median/IQR robust-z monitor
    (event_rate_anomalies): a gradual ramp shifts the EWMA baseline
    along with it, so only deviations from the RECENT trajectory
    flag.

    The forecast for hour t is the geometrically-decayed weighted
    mean of the previous ``horizon`` hourly counts
    (w_j = (1-alpha)^(j-1), normalized over the lags that exist) —
    the EWMA recurrence unrolled to a fixed trailing window, which
    keeps it a pure per-key window expression (no recursion) that
    both engines evaluate identically. Hours with n/forecast outside
    [ratio_lo, ratio_hi] flag.

    Plan: one hash aggregation to hourly counts, one window
    partitioned by key (hours per key = calendar-scale), all
    arithmetic codegen'd. Returns (key, hour, n, forecast, ratio,
    is_anomaly) for every hour with at least one prior observation.
    """
    from pyspark.sql import Window

    hourly = df.groupBy(
        F.col(key_col), F.date_trunc("hour", ts_col).alias("hour")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy(key_col).orderBy("hour")
    decay = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(1, horizon + 1):
        lagged = F.lag("n", j).over(w)
        wt = F.lit(decay ** (j - 1))
        num = num + F.coalesce(lagged.cast("double") * wt, F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), wt).otherwise(F.lit(0.0))
    # the first hour per key has no lags: den == 0, forecast NULL
    # (guarded — ANSI mode raises on a bare divide)
    forecast = F.round(F.when(den > 0, num / den), 6)
    out = hourly.select(
        key_col,
        "hour",
        "n",
        forecast.alias("forecast"),
        F.round(F.col("n") / forecast, 6).alias("ratio"),
    ).where(F.col("forecast").isNotNull())
    return out.withColumn(
        "is_anomaly",
        (F.col("ratio") >= ratio_hi) | (F.col("ratio") <= ratio_lo),
    )
