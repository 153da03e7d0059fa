"""OLAP coverage catalog: the relational operators Spark provides
natively that the reference never had (SURVEY.md §2.3 note, §2.4
note, §2.8) — multi-dimensional aggregation, semi/anti joins, as-of
joins, pivot, percentiles, running windows. Declared here so the
oracle gate proves the engine's full analytics surface, not just
reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kissmetrics_to_database_spark.plans.catalog import query
from kissmetrics_to_database_spark.session import load_table


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + aggregate — every predicate must
    reach the parquet scan (verified by the plan audit pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "correlated_subquery_above_avg",
    """
    SELECT c_mktsegment, count(*) AS n_above_avg
    FROM customer c
    WHERE c_acctbal > (
      SELECT round(sum(c2.c_acctbal), 2) / count(*)
      FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment
    )
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into a
    join under the hood). Threshold derives from the rounded sum so
    both engines compare against bit-identical values."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_above_avg
        FROM customer_cs c
        WHERE c_acctbal > (
          SELECT round(sum(c2.c_acctbal), 2) / count(*)
          FROM customer_cs c2 WHERE c2.c_mktsegment = c.c_mktsegment
        )
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@query(
    "intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
)
def q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (completes the set-op family next to union/except)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b).orderBy("user_id")


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH costs AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
             min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_size < 10
    )
    SELECT DISTINCT p_partkey, s_suppkey, s_name,
           round(s_acctbal, 2) AS s_acctbal, n_name
    FROM costs WHERE s_acctbal = min_bal
    ORDER BY p_partkey, s_suppkey
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: per-part minimum-balance supplier via a window
    minimum instead of a correlated subquery — one shuffle on
    p_partkey instead of re-aggregating per probe. Equality filter on
    the raw double is engine-safe: both engines compare the same
    stored parquet values."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") < 10)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        part.join(li, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("p_partkey")
    costs = joined.select(
        "p_partkey",
        "s_suppkey",
        "s_name",
        "s_acctbal",
        "n_name",
        F.min("s_acctbal").over(w).alias("min_bal"),
    )
    return (
        costs.where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT round(
             CAST(100.0 AS DOUBLE)
             * round(sum(CASE WHEN p_type = 'ECONOMY'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
             / round(sum(l_extendedprice * (1 - l_discount)), 2), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: ratio of conditional to total revenue (both
    sums rounded before the division so each engine divides identical
    operands)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.round(F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0)), 2)
            / F.round(F.sum(rev), 2),
            6,
        ).alias("promo_pct")
    )


@query(
    "tpch_q17_small_quantity",
    """
    WITH avg_qty AS (
      SELECT l_partkey AS pk,
             round(sum(l_quantity), 2) / count(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(round(sum(l_extendedprice), 2) / 7.0, 6) AS avg_yearly
    FROM lineitem JOIN avg_qty ON l_partkey = pk
    WHERE l_quantity < 0.2 * aq
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: per-part average-quantity threshold (the
    correlated aggregate decorrelated into a join)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("aq")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, total_qty
    FROM orders JOIN (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: HAVING filter on an aggregate feeding a join,
    top-20 with total order."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .where(F.col("_raw_qty") > 150)
        .drop("_raw_qty")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "rollup_agg",
    """
    SELECT CAST(grouping(event_type) AS BIGINT) AS g_type,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type)
    ORDER BY g_type, event_type
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() disambiguation — subtotals + grand
    total in one pass (partial aggregation handles both levels)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.grouping("event_type").cast("long").alias("g_type"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("g_type", "event_type", "n", "total_value")
        .orderBy("g_type", "event_type")
    )


@query(
    "cube_agg",
    """
    SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("g_rf", "g_ls", "l_returnflag", "l_linestatus", "n", "sum_qty")
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


@query(
    "grouping_sets",
    """
    SELECT CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
           o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (Catalyst expands to an
    Expand node — one scan feeds every set)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
               o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


@query(
    "pivot_event_values",
    """
    SELECT user_id,
           round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click,
           round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase,
           round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 2) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user value totals spread across event-type columns
    (declared pivot values → no extra distinct-discovery job)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .sum("value")
    )
    return out.select(
        "user_id",
        *[
            F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c)
            for c in ["click", "purchase", "view"]
        ],
    ).orderBy("user_id")


@query(
    "semi_join_exists",
    """
    SELECT c_mktsegment, count(*) AS n_customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having a big order. The
    semi join never materializes the probe side's payload."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_with_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "anti_join_not_exists",
    """
    SELECT c_mktsegment, count(*) AS n_customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "asof_last_signup",
    """
    SELECT event_id,
           user_id,
           last_signup_epoch,
           CAST(epoch_s - last_signup_epoch AS BIGINT) AS delay_s
    FROM (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             last_value(CASE WHEN event_type = 'signup'
                             THEN CAST(floor(epoch(ts)) AS BIGINT) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_signup_epoch
      FROM events
    )
    WHERE event_type = 'purchase' AND last_signup_epoch IS NOT NULL
    ORDER BY event_id
    """,
)
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each purchase matched to the user's most
    recent prior-or-same-instant signup. Spark lacks a native as-of
    join; the conditional last-IGNORE-NULLS running window is the
    shuffle-minimal composition (one window, no self-join) — the
    pattern holds for any time-versioned dimension at scale."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", epoch), ignorenulls=True
    ).over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            epoch.alias("epoch_s"),
            last_signup.alias("last_signup_epoch"),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("last_signup_epoch").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "last_signup_epoch",
            (F.col("epoch_s") - F.col("last_signup_epoch")).alias("delay_s"),
        )
        .orderBy("event_id")
    )


@query(
    "percentile_exact",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use
    linear interpolation on the sorted values)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


@query("approx_aggregates", None)  # sketch internals are engine-specific → rows-only
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct + quantile sketch) beside
    their exact counterparts. No oracle: sketch results are
    engine-specific by design; the exact columns anchor sanity."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.percentile_approx("value", 0.5), 2).alias("approx_p50"),
        F.round(F.percentile("value", F.lit(0.5)), 2).alias("exact_p50"),
    )


@query(
    "running_total",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    WHERE user_id < 10
    ORDER BY event_id
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total over event time (cumulative window;
    exact-cents true values make the per-row rounding engine-safe)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    ).orderBy("event_id")


@query(
    "first_event_per_user",
    """
    SELECT user_id,
           arg_min(event_type, event_id) AS first_type,
           arg_max(event_type, event_id) AS last_type,
           count(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-min/arg-max) with a unique ordering key —
    first/last event type per user without a window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", "event_id").alias("first_type"),
            F.max_by("event_type", "event_id").alias("last_type"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
    )
