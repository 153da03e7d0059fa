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
