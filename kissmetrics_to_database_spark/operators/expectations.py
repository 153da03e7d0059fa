"""Data-quality expectations: a Deequ-style constraint audit.

A 100-TB landing pipeline gates ingestion on declared constraints —
"o_custkey is never null", "o_orderstatus ∈ {O,F,P}", "every
l_orderkey exists in orders" — and wants ONE report row per check,
not one job per check. The reference's analytics layer stops at
row counts and max-lengths (SURVEY §2 A1/A2,
/root/reference/src/Operations/AnalyzeTables.php-equivalent
behaviors); this module is the forward-looking completion of that
family for pipeline gating.

Scale design — the whole point of the operator:

- Every SINGLE-TABLE check (completeness, uniqueness,
  accepted-values, range, regex, non-negativity…) folds into ONE
  ``agg`` over ONE scan of the table: each check contributes a
  conditional-count expression (``sum(CASE WHEN ok THEN 1 END)``)
  and the uniqueness checks contribute ``count_distinct``. N checks
  = 1 job, 1 shuffle-free partial-aggregate tree (Catalyst compiles
  the lot into a single WholeStageCodegen span; PLANS.md asserts no
  Exchange before the final single-row reduce).
- REFERENTIAL checks (foreign key ⊆ dimension key) are the only ones
  that need a second table: each runs as one distinct-project +
  left-anti join, broadcast when the dimension is small (Catalyst /
  AQE decides from stats — at 100 TB a fact-to-fact containment
  check becomes a shuffle join on the key, which is the right plan).
- All metrics are exact BIGINT numerators/denominators; the ratio is
  ONE terminal ``F.round(…, 6)`` per row — the repo's
  integer-snap determinism convention (layout/partitioning can never
  change a comparison against the threshold).

Check specs (plain dicts, declarative):

  {"check": "completeness",     "column": c, "threshold": 0.99}
  {"check": "uniqueness",       "column": c, "threshold": 1.0}
  {"check": "accepted_values",  "column": c, "values": [...], ...}
  {"check": "in_range",         "column": c, "lo": x, "hi": y, ...}
  {"check": "matches_regex",    "column": c, "pattern": r"...", ...}
  {"check": "non_negative",     "column": c, "threshold": 1.0}
  {"check": "referential",      "column": fk, "ref": (df, key), ...}

``threshold`` is the minimum passing ratio (default 1.0). NULL
handling is explicit per check: completeness counts non-nulls over
all rows; the value checks (accepted/range/regex/non-negative)
measure only non-null values (a null is a completeness problem, not
a domain problem); uniqueness is distinct-over-present;
referential measures non-null FK values found in the reference keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALUE_CHECKS = {
    "accepted_values",
    "in_range",
    "matches_regex",
    "non_negative",
}


def _good_expr(spec: dict):
    """Boolean 'row is good' expression for a value check, evaluated
    over non-null values only."""
    c = F.col(spec["column"])
    kind = spec["check"]
    if kind == "accepted_values":
        return c.isin(list(spec["values"]))
    if kind == "in_range":
        return (c >= F.lit(spec["lo"])) & (c <= F.lit(spec["hi"]))
    if kind == "matches_regex":
        return c.cast("string").rlike(spec["pattern"])
    if kind == "non_negative":
        return c >= F.lit(0)
    raise ValueError(f"unknown value check {kind!r}")


def expectation_report(
    df: DataFrame, checks: list[dict], table: str = "table"
) -> DataFrame:
    """Evaluate ``checks`` against ``df`` → one report row per check:
    (table, check, column, n_rows, n_good, ratio, passed). See the
    module docstring for the one-scan design and NULL semantics."""
    singles = [c for c in checks if c["check"] != "referential"]
    refs = [c for c in checks if c["check"] == "referential"]

    aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
    for i, spec in enumerate(singles):
        col = spec["column"]
        kind = spec["check"]
        if kind == "completeness":
            aggs.append(
                F.count(F.col(col)).cast("long").alias(f"_g{i}")
            )
            aggs.append(
                F.count(F.lit(1)).cast("long").alias(f"_n{i}")
            )
        elif kind == "uniqueness":
            aggs.append(
                F.count_distinct(F.col(col))
                .cast("long")
                .alias(f"_g{i}")
            )
            aggs.append(F.count(F.col(col)).cast("long").alias(f"_n{i}"))
        elif kind in _VALUE_CHECKS:
            good = _good_expr(spec)
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & good, F.lit(1)
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(f"_g{i}")
            )
            aggs.append(F.count(F.col(col)).cast("long").alias(f"_n{i}"))
        else:
            raise ValueError(f"unknown check {kind!r}")

    spark = df.sparkSession
    parts = []
    if singles:
        # ONE aggregate row, fanned out to one report row per check
        # by exploding an array of structs on the SAME plan node —
        # selecting the agg N times in a union would recompute the
        # scan N times, which is the multi-job shape this operator
        # exists to avoid.
        row_df = df.agg(*aggs)
        items = F.array(
            *[
                F.struct(
                    F.lit(spec["check"]).alias("check"),
                    F.lit(spec["column"]).alias("column"),
                    F.col(f"_n{i}").alias("n_rows"),
                    F.col(f"_g{i}").alias("n_good"),
                    F.lit(float(spec.get("threshold", 1.0))).alias(
                        "_thr"
                    ),
                )
                for i, spec in enumerate(singles)
            ]
        )
        parts.append(
            row_df.select(F.explode(items).alias("e")).select(
                F.lit(table).alias("table"),
                F.col("e.check").alias("check"),
                F.col("e.column").alias("column"),
                F.col("e.n_rows").alias("n_rows"),
                F.col("e.n_good").alias("n_good"),
                F.col("e._thr").alias("_thr"),
            )
        )
    for spec in refs:
        ref_df, ref_key = spec["ref"]
        fk = spec["column"]
        present = df.select(F.col(fk)).where(F.col(fk).isNotNull())
        missing = present.join(
            ref_df.select(F.col(ref_key).alias(fk)).distinct(),
            on=fk,
            how="left_anti",
        )
        agg = present.agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        ).crossJoin(
            missing.agg(F.count(F.lit(1)).cast("long").alias("_m"))
        )
        parts.append(
            agg.select(
                F.lit(table).alias("table"),
                F.lit("referential").alias("check"),
                F.lit(fk).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col("_m")).alias("n_good"),
                F.lit(float(spec.get("threshold", 1.0))).alias("_thr"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [],
            "table string, check string, column string, n_rows long, "
            "n_good long, ratio double, passed boolean",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    ratio = F.when(F.col("n_rows") == 0, F.lit(1.0)).otherwise(
        F.round(F.col("n_good") / F.col("n_rows"), 6)
    )
    return out.select(
        "table",
        "check",
        "column",
        "n_rows",
        "n_good",
        ratio.alias("ratio"),
        (ratio >= F.col("_thr")).alias("passed"),
    )
