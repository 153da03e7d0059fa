"""Parquet-backed shared-artifact semantics (r9): build exactly once
per (session, name, key), survive storage pressure (no cache
dependence), and serve every consumer the identical rows."""

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.plans import catalog_ext


def test_shared_artifact_builds_once_and_round_trips(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(
            F.col("id"), (F.col("id") * 2).alias("dbl")
        )

    a = catalog_ext._shared_artifact(spark, "t_once", "k1", build)
    b = catalog_ext._shared_artifact(spark, "t_once", "k1", build)
    assert calls["n"] == 1  # second consumer served from parquet
    assert sorted(r["dbl"] for r in b.collect()) == [0, 2, 4, 6, 8]
    assert a.schema == b.schema
    # a different key builds independently
    catalog_ext._shared_artifact(spark, "t_once", "k2", build)
    assert calls["n"] == 2


def test_shared_artifact_is_disk_backed_not_cached(spark):
    def build():
        return spark.range(3).select(F.col("id"))

    df = catalog_ext._shared_artifact(spark, "t_disk", "k", build)
    # wiping every cached block must not change the result — the
    # artifact is a file, not a persist()
    spark.catalog.clearCache()
    assert sorted(r["id"] for r in df.collect()) == [0, 1, 2]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
