"""Kissmetrics event-row transforms (SURVEY.md §2.2 P1-P7, §2.7).

The reference transforms every ingested NDJSON row in PHP, one row at
a time (reference: src/Operations/ProcessFile.php:24-46,
src/KissmetricsToDatabase.php:264-352). Here each step is a pure
column expression / DataFrame function, so the whole pipeline is one
Catalyst plan: a single parquet/json scan feeding a projection, fully
codegen'd, no shuffle.

Determinism contract (FIXTURES.md):
- epoch formatting is UTC (session TZ pinned in session.py);
- ``md5hash`` concatenates values in an explicitly declared column
  order (the ingest schema order), empty string for NULLs, no
  separator — matching the reference's ``implode('', $values)``
  (KissmetricsToDatabase.php:293);
- ``created_at`` is an injected constant in tests, ``current_date()``
  in production.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reserved Kissmetrics keys (SURVEY.md §1.3).
PERSON_KEY = "_p"
ALIAS_KEY = "_p2"
EVENT_NAME_KEY = "_n"
EPOCH_KEY = "_t"


def sanitize_key(name: str) -> str:
    """P1/F7: column-name sanitize — ``-``, space, ``_`` → ``_``.

    Reference: helpers.php:28-35 (str_replace(['-', ' ', '_'], '_')).
    Driver-side (schemas are metadata, not data): renaming columns is
    free in Spark.
    """
    return re.sub(r"[- _]", "_", name)


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Apply :func:`sanitize_key` to every column, deduping collisions.

    The monolith keeps the first occurrence when two raw keys sanitize
    to the same name (KissmetricsToDatabase.php:204-210); we do the
    same, dropping later duplicates.
    """
    seen: set[str] = set()
    keep: list[Column] = []
    for c in df.columns:
        s = sanitize_key(c)
        if s in seen:
            continue
        seen.add(s)
        keep.append(F.col(f"`{c}`").alias(s))
    return df.select(*keep)


def with_n_not_null(df: DataFrame, event_name_col: str = EVENT_NAME_KEY) -> DataFrame:
    """P2+P3: preserve the raw event name, then NULL out empties.

    Reference: ProcessFile.php:40 (``_n_not_null``),
    KissmetricsToDatabase.php:281-286 (``_n = '' → NULL``).
    """
    c = F.col(f"`{event_name_col}`")
    return df.withColumn("_n_not_null", F.coalesce(c, F.lit(""))).withColumn(
        event_name_col, F.when(c == "", None).otherwise(c)
    )


def epoch_to_timestamp_str(col: Column) -> Column:
    """P4/F9: unix-seconds → ``yyyy-MM-dd HH:mm:ss`` string, UTC.

    Reference: KissmetricsToDatabase.php:289-291 (``date('Y-m-d H:i:s', $_t)``).
    """
    return F.date_format(F.from_unixtime(col.cast("long")), "yyyy-MM-dd HH:mm:ss")


def with_formatted_t(df: DataFrame, epoch_col: str = EPOCH_KEY) -> DataFrame:
    """Replace the raw epoch column with its formatted form (P4)."""
    return df.withColumn(epoch_col, epoch_to_timestamp_str(F.col(f"`{epoch_col}`")))


def row_fingerprint(cols: list[Column | str], separator: str = "") -> Column:
    """P5/F1/F3: md5 of all values concatenated in declared order.

    Reference: KissmetricsToDatabase.php:293 —
    ``md5(implode('', $raw_query_values))``. NULLs contribute '' (the
    reference substitutes the literal string before imploding), and the
    reference uses no separator (collision-prone but kept for
    fidelity). ``concat_ws`` skips NULLs, which matches.
    """
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws(separator, *[e.cast("string") for e in exprs]))


def with_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Add the ``md5hash`` fingerprint over ``cols`` (default: all, in
    schema order — the declared ingest order)."""
    cols = cols if cols is not None else list(df.columns)
    return df.withColumn("md5hash", row_fingerprint(cols))


def with_load_date(df: DataFrame, fixed_date: str | None = None) -> DataFrame:
    """P6/F10: ``created_at`` load-date column.

    Reference: FileImporter.php:82-85 (``date('Y-m-d')`` at insert
    time). ``fixed_date`` pins it for tests (FIXTURES.md determinism).
    """
    d = F.to_date(F.lit(fixed_date)) if fixed_date else F.current_date()
    return df.withColumn("created_at", d)


def non_blank_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """P7/F6: drop blank lines from a ``spark.read.text`` scan.

    Reference: ProcessFile.php:28-31, KissmetricsToDatabase.php:188-190.
    """
    return df.filter(F.length(F.trim(F.col(col))) > 0)


def transform_events(
    df: DataFrame,
    fingerprint_cols: list[str] | None = None,
    fixed_date: str | None = None,
) -> DataFrame:
    """The full per-row transform pipeline (§3.1 restated in Spark).

    sanitize keys → _n_not_null/_n-null → _t format → md5hash →
    created_at. One narrow projection, no shuffle; Catalyst collapses
    it into the scan.
    """
    out = sanitize_columns(df)
    if EVENT_NAME_KEY in out.columns:
        out = with_n_not_null(out)
    if EPOCH_KEY in out.columns:
        out = with_formatted_t(out)
    out = with_fingerprint(out, fingerprint_cols)
    return with_load_date(out, fixed_date)


def decayed_user_features(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_s: int = 7 * 86400,
    ndigits: int = 6,
) -> DataFrame:
    """Per-user exponentially time-decayed activity features — the
    standard recency-weighted signals a ranking/abuse model consumes:
    each event contributes ``value * 0.5^(age / half_life)`` with age
    measured from the user's LATEST event.

    Two aggregations sharing one user-keyed partitioning: max-ts per
    user joins back onto the rows on the same key (co-partitioned —
    no second full shuffle of the fact side; AQE broadcasts the
    skinny per-user table when it fits), then one map-side-combinable
    sum. No window function, no per-user sort. The anchor-at-max-ts
    form is deliberate: the algebraic single-pass rewrite
    (``0.5^(T/τ)·Σ v·2^(t/τ)``) overflows doubles once the corpus
    spans ~1000 half-lives, so the two-pass join is the one that
    survives decades of data.

    Returns (user, n_events, decayed_value, last_seen_epoch).
    """
    # micros → fractional seconds: identical IEEE division on both
    # engines (unix_timestamp would truncate sub-second parts and
    # DuckDB's epoch() wouldn't — micro-anchoring keeps them equal)
    us = F.unix_micros(F.col(ts_col)).cast("double") / F.lit(1000000.0)
    base = df.where(
        F.col(user_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(user_col), us.alias("_s"), F.col(value_col).cast("double").alias("_v"))
    last = base.groupBy(user_col).agg(F.max("_s").alias("_last"))
    decay = F.pow(F.lit(0.5), (F.col("_last") - F.col("_s")) / F.lit(float(half_life_s)))
    return (
        base.join(last, user_col)
        .groupBy(user_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("_v") * decay), ndigits).alias("decayed_value"),
            F.floor(F.max("_s")).cast("long").alias("last_seen_epoch"),
        )
    )
