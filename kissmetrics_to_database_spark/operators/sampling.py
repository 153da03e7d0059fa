"""Deterministic weighted sampling — corpus subsetting that survives
re-runs, audits, and engine swaps.

Training-data pipelines sample constantly (quality-weighted corpus
cuts, eval holdouts, ablation subsets), and at 100 TB a sample that
changes between runs poisons every downstream comparison. These
operators make the randomness a PURE FUNCTION of the row id: the
"random" uniform is an md5-derived 48-bit fraction, so the same corpus
always yields the same sample, any engine can replay it (the DuckDB
oracle runs the identical math), and adding rows never perturbs the
keys of existing rows — the sample is incrementally stable.

Complements the hash-split / stratified operators in the corpus suite
(`plans/catalog_ext.py`): those partition; this one draws a
weighted-without-replacement sample of a target size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO_48 = float(1 << 48)


def deterministic_uniform(id_col) -> "F.Column":
    """U(0,1) as a pure function of the id: the first 48 bits of
    md5(id) as a midpoint fraction ``(v + 0.5) / 2^48``. Exact double
    arithmetic (48-bit int + power-of-two divide), so every engine
    computes the identical uniform; never 0 or 1, so logs are safe."""
    v = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 12), 16, 10).cast(
        "double"
    )
    return (v + F.lit(0.5)) / F.lit(_TWO_48)


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    ndigits: int = 6,
) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    A-ES: each row draws priority key ``ln(u) / w`` (the log-domain
    form of ``u^(1/w)`` — identical ordering, better conditioning)
    and the top ``k`` keys win. Inclusion probability is proportional
    to weight, exactly the A-ES guarantee.

    Distributed shape: the key is a map-only projection; selection is
    a ``k``-row TakeOrdered — no global sort ever materializes, and
    per-partition top-k pre-filtering means the driver sees only
    ``k × partitions`` candidates. Keys round to ``ndigits`` with an
    id tie-break, so ranking is engine-exact. Rows with
    non-positive or null weight are excluded (they have zero
    inclusion probability by definition).

    Returns (id, weight, wkey, rank) ordered by rank.
    """
    w = F.col(weight_col).cast("double")
    keyed = (
        df.where(w.isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.round(
                F.log(deterministic_uniform(F.col(id_col))) / w, ndigits
            ).alias("wkey"),
        )
    )
    top = keyed.orderBy(F.col("wkey").desc(), F.col(id_col)).limit(k)
    win = Window.orderBy(F.col("wkey").desc(), F.col(id_col))
    return top.select(
        id_col,
        "weight",
        "wkey",
        F.row_number().over(win).cast("long").alias("rank"),
    )


def temporal_split_audit(
    df: DataFrame,
    cutoff: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal train/eval split with the leakage audit that must
    accompany it: rows at ``ts < cutoff`` are train, the rest eval,
    and the report counts the entities appearing on BOTH sides —
    every one of them leaks behavioral signal across the boundary
    (per-entity features fit on train describe the same entity being
    evaluated). The standard hygiene check before any time-based
    eval; the fix (entity-disjoint temporal split) drops or reassigns
    the overlap set.

    One aggregation pass: per entity, rows before/after the cutoff,
    collapsed to a single summary row (split sizes, entity counts,
    leaking-entity count and ratio). All map-side-combinable; no
    joins.
    """
    cut = F.lit(cutoff).cast("timestamp")
    per_entity = (
        df.where(F.col(entity_col).isNotNull())
        .groupBy(entity_col)
        .agg(
            F.sum((F.col(ts_col) < cut).cast("long")).alias("_train"),
            F.sum((F.col(ts_col) >= cut).cast("long")).alias("_eval"),
        )
    )
    return per_entity.agg(
        F.sum("_train").cast("long").alias("train_rows"),
        F.sum("_eval").cast("long").alias("eval_rows"),
        F.sum((F.col("_train") > 0).cast("long")).alias("train_entities"),
        F.sum((F.col("_eval") > 0).cast("long")).alias("eval_entities"),
        F.sum(
            ((F.col("_train") > 0) & (F.col("_eval") > 0)).cast("long")
        ).alias("leaking_entities"),
    ).select(
        "*",
        F.round(
            F.col("leaking_entities")
            / F.greatest(F.col("eval_entities"), F.lit(1)),
            6,
        ).alias("leakage_ratio"),
    )
