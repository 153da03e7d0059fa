"""Slowly-changing-dimension (Type 2) versioning.

The reference's whole mission is loading event data into a warehouse
(Redshift; KissmetricsToDatabase.php:810-867 assembles the INSERT
batches) — SCD2 is the canonical warehouse pattern one step further:
instead of append-only facts, maintain a VERSIONED dimension where
each attribute change closes the previous row (`valid_to`) and opens
a new one (`valid_from`), so any historical point-in-time join is an
``BETWEEN valid_from AND valid_to`` lookup.

Two entry points:
- `scd2_from_change_log` — collapse an ordered change log into
  version intervals (gaps-and-islands). One shuffle, on the entity
  key; each entity's history is processed inside its own window
  partition, so the operator scales with the number of entities,
  not the per-entity history length skew (AQE skew-split covers
  pathological single-entity logs).
- `scd2_merge_batch` — apply a new batch of changes to an existing
  SCD2 dimension (the incremental form: close out current rows
  whose entity changed, append the new versions). This is the
  MERGE-INTO shape warehouses run nightly, expressed as a
  broadcast-friendly anti/semi join + union, no full-table rewrite
  of unchanged entities' history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_change_log(
    log: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an ordered per-entity change log into SCD2 rows.

    Consecutive log rows with the SAME attribute value merge into one
    version (classic gaps-and-islands via ``lag``); each version row
    carries (key, attr, valid_from, valid_to, version, is_current)
    with ``valid_to`` null on the open version. Ordering within an
    entity is (ts, tiebreak) so equal timestamps resolve identically
    on every engine.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        log.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .where(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    wv = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(wv))
        .withColumn("version", F.row_number().over(wv).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col, attr_col, "valid_from", "valid_to", "version",
            "is_current",
        )
    )


def scd2_point_in_time(
    dim: DataFrame,
    facts: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup: attach to each fact row the dimension
    version whose validity interval contains the fact's timestamp
    (``valid_from <= ts < valid_to``, open version unbounded).

    This is THE feature-store primitive: joining training facts to
    attributes *as they were at event time* is what makes a feature
    leakage-free by construction — an ordinary join against current
    attributes silently leaks the future into training data.

    Plan shape: an equi-join on the entity key with the interval
    bounds as residual predicates — one key-partitioned shuffle, no
    range explosion; per key the residual scans that entity's
    version list (bounded by its change count). SCD2 intervals
    partition time, so exactly one version matches per fact.
    """
    d = dim.select(
        F.col(key_col).alias("_d_key"),
        *[
            F.col(c).alias(f"_d_{c}")
            for c in dim.columns
            if c != key_col
        ],
    )
    # residual bounds INSIDE the join condition: a fact whose key has
    # versions but none containing its ts (possible when facts predate
    # the dimension's history) keeps its row with null attributes —
    # a post-join filter would drop it instead
    cond = (
        (F.col(key_col) == F.col("_d_key"))
        & (F.col("_d_valid_from") <= F.col(ts_col))
        & (
            F.col("_d_valid_to").isNull()
            | (F.col(ts_col) < F.col("_d_valid_to"))
        )
    )
    out = facts.join(d, cond, "left").drop("_d_key")
    for c in dim.columns:
        if c != key_col:
            out = out.withColumnRenamed(f"_d_{c}", c)
    return out


def scd2_merge_batch(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """Incrementally apply one change batch (one row per entity:
    latest observed attr + ts) to an SCD2 dimension.

    - entities whose current attr DIFFERS from the batch: current row
      closes (valid_to = batch ts), a new open version appends;
    - entities matching their current attr, and entities absent from
      the batch: history passes through untouched;
    - brand-new entities open at version 1.

    Plan shape: ONE left join of the dimension against the (small,
    broadcastable) batch, then a conditional explode — a changing
    current row fans out to [closed, opened], every other row passes
    through as itself. The dimension subtree is evaluated twice
    (main pass + the brand-new anti-probe), not once per union
    branch: with a derived dim that's the difference between 2 and 5
    window computations (sf0.1 bench, round 4), and with a
    materialized 100 TB dim it's two scans where history moves
    through untouched.
    """
    ts_type = dim.schema["valid_to"].dataType
    b = batch.select(
        F.col(key_col),
        F.col(attr_col).alias("_new_attr"),
        F.col(ts_col).alias("_new_ts"),
    )

    keep_s = F.struct(
        F.col(attr_col).alias(attr_col),
        F.col("valid_from"),
        F.col("valid_to"),
        F.col("version"),
        F.col("is_current"),
    )
    closed_s = F.struct(
        F.col(attr_col).alias(attr_col),
        F.col("valid_from"),
        F.col("_new_ts").alias("valid_to"),
        F.col("version"),
        F.lit(False).alias("is_current"),
    )
    opened_s = F.struct(
        F.col("_new_attr").alias(attr_col),
        F.col("_new_ts").alias("valid_from"),
        F.lit(None).cast(ts_type).alias("valid_to"),
        (F.col("version") + 1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        F.col("is_current")
        & F.col("_new_attr").isNotNull()
        & (F.col("_new_attr") != F.col(attr_col))
    )
    merged = (
        dim.join(b, key_col, "left")
        .select(
            key_col,
            F.explode(
                F.when(changes, F.array(closed_s, opened_s)).otherwise(
                    F.array(keep_s)
                )
            ).alias("_r"),
        )
        .select(key_col, "_r.*")
    )
    brand_new = (
        b.join(
            dim.where(F.col("is_current")).select(key_col),
            key_col,
            "left_anti",
        )
        .select(
            key_col, F.col("_new_attr").alias(attr_col),
            F.col("_new_ts").alias("valid_from"),
            F.lit(None).cast(ts_type).alias("valid_to"),
            F.lit(1).cast("long").alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    return merged.unionByName(brand_new)
