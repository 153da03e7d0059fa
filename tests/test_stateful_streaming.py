"""applyInPandasWithState: per-key state must accumulate across
micro-batches and survive via the checkpoint."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from kissmetrics_to_database_spark.streaming import stateful

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "st_src"
    src.mkdir()
    (src / "1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "value": 10.0},
                {"user_id": 1, "value": 5.0},
                {"user_id": 2, "value": 1.0},
            ]
        )
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = stateful.running_user_totals_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "st_ckpt"))
        .start()
    )
    q.processAllAvailable()

    # second micro-batch: state for user 1 must carry over
    (src / "2.json").write_text(json.dumps({"user_id": 1, "value": 2.5}))
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM user_totals").collect()
    # update mode appends each emission; the latest per user wins
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (3, 17.5)
    assert latest[2] == (1, 1.0)


def test_ewma_monitor_scores_against_prior_and_advances(spark, tmp_path):
    # batch 1 seeds (no flag); batch 2 has 4x the rate -> scored
    # against the PRIOR ewma, flags, then the recurrence advances
    src = tmp_path / "ewma_src"
    src.mkdir()
    schema = T.StructType([T.StructField("event_type", T.StringType())])
    (src / "1.json").write_text(
        "\n".join(json.dumps({"event_type": "click"}) for _ in range(10))
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = stateful.ewma_rate_monitor_stream(stream, alpha=0.3)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_mon")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .start()
    )
    q.processAllAvailable()
    (src / "2.json").write_text(
        "\n".join(json.dumps({"event_type": "click"}) for _ in range(40))
    )
    q.processAllAvailable()
    (src / "3.json").write_text(
        "\n".join(json.dumps({"event_type": "click"}) for _ in range(19))
    )
    q.processAllAvailable()
    q.stop()

    rows = sorted(
        spark.sql("SELECT * FROM ewma_mon").collect(), key=lambda r: r["n"]
    )
    by_n = {r["n"]: r for r in rows}
    assert by_n[10]["is_anomaly"] is False and by_n[10]["ewma"] is None
    # batch 2: prior ewma = 10 -> ratio 4.0 -> anomaly
    assert by_n[40]["ewma"] == 10.0 and by_n[40]["ratio"] == 4.0
    assert by_n[40]["is_anomaly"] is True
    # batch 3: ewma advanced to .3*40 + .7*10 = 19 -> ratio 1.0
    assert by_n[19]["ewma"] == 19.0 and by_n[19]["ratio"] == 1.0
    assert by_n[19]["is_anomaly"] is False

