"""Streaming wrapper: the batch transforms under Structured Streaming.

The reference is a repeated incremental batch loop — the precursor of
Structured Streaming's file source (SURVEY.md §2.9): watermark =
checkpointed file index, at-least-once delivery = foreachBatch + txn
sink, natural file order = file-source ordering.

Every transform in this engine is a pure DataFrame→DataFrame
function, so the same code runs under ``spark.read`` and
``readStream``:
- ``stream_ndjson_pipeline``: file-source stream → per-row transform
  → foreachBatch sink (checkpoint dir carries the processed-file
  index — the reference's watermark file, managed by Spark);
- ``windowed_event_counts``: the event-time extension (watermark +
  tumbling window) the reference never had, for late data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from kissmetrics_to_database_spark.functions import events_transform


def stream_ndjson_pipeline(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    sink: Callable[[DataFrame, int], None],
    fixed_date: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source NDJSON stream → reference transform → foreachBatch.

    ``sink(batch_df, epoch_id)`` runs the terminal write (JDBC/parquet)
    transactionally per micro-batch; the checkpoint commits only after
    it returns — the reference's advance-after-commit watermark
    contract, managed by the engine.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(source_dir)
    transformed = events_transform.transform_events(raw, fixed_date=fixed_date)
    return (
        transformed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling aggregation with a lateness watermark —
    works identically on a static or streaming DataFrame (the batch
    shape is the catalog's tumbling_window_hourly query)."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
