"""Skew-salting equivalence and bucketed-write shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ["hot", "a", "b"] for i in range(50 if k == "hot" else 3)],
        ["k", "v"],
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("a", 2.0), ("c", 3.0)], ["k", "w"]
    )
    plain = {
        (r["k"], r["v"], r["w"])
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r["k"], r["v"], r["w"])
        for r in skew.salted_join(left, right, "k", num_salts=4).collect()
    }
    assert salted == plain and len(plain) == 53


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)] + [("cold", 1.5)], ["k", "v"]
    )
    plain = {
        (r["k"], r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("total"))
        .collect()
    }
    salted = {
        (r["k"], r["n"], r["total"])
        for r in skew.salted_agg_count_sum(df, "k", "v", num_salts=4).collect()
    }
    assert salted == plain


def test_bucketed_join_skips_shuffle(spark):
    # bucketBy co-locates both sides on the join key at write time;
    # the later join must not re-shuffle (no Exchange above the scans).
    # Tables land in ./spark-warehouse (gitignored) — warehouse.dir is
    # a static conf and cannot be pointed at tmp_path per-test.
    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") * 3)
    a.write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (tiny test tables would otherwise
        # broadcast, which disables bucketed scans entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_key_skew_report_hand_computed(spark):
    from kissmetrics_to_database_spark.operators import skew

    # key 'a' owns 6 of 10 rows; 3 distinct keys
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    r = skew.key_skew_report(df, ["k"]).collect()[0]
    assert r["key_column"] == "k"
    assert r["n_distinct"] == 3 and r["n_rows"] == 10
    assert r["top_share"] == 0.6
    assert r["skew_ratio"] == round(6 * 3 / 10, 6)  # 1.8x the mean bucket
    assert r["top_keys"] == "a,b,c"
