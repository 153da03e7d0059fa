"""Dynamic schema evolution (SURVEY.md S8, A2, U2).

The reference diffs each row's keys against information_schema and
issues ``ALTER TABLE ADD <col> VARCHAR(max)`` per new key, tracking
max value length per key (reference: src/Operations/FileImporter.php:
28-69, src/KissmetricsToDatabase.php:202-257).

Spark restatement: schemas are first-class — evolution is
``unionByName(allowMissingColumns=True)`` across batches, and the
"type system" (max string length per column) is one aggregation.
The DDL emitter produces the warehouse statements for a JDBC sink
that needs explicit ALTERs (Redshift), computed once per batch from
metadata instead of per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def union_evolving(batches: list[DataFrame]) -> DataFrame:
    """Union batches whose column sets differ; missing columns become
    NULL — the exact semantics of the reference's ALTER-then-insert
    (S8). One plan, no shuffle beyond the union."""
    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out


def new_columns(incoming: DataFrame, existing_cols: list[str]) -> list[str]:
    """U2: keys present in the batch but absent from the table."""
    existing = set(existing_cols)
    return [c for c in incoming.columns if c not in existing]


def max_lengths(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """A2: per-column max string length — the reference's entire type
    system, as one aggregation (map-side combinable)."""
    cols = cols or df.columns
    row = df.agg(
        *[
            F.max(F.length(F.col(f"`{c}`").cast("string"))).alias(c)
            for c in cols
        ]
    ).collect()[0]
    return {c: (row[c] or 0) for c in cols}


def ddl_add_columns(
    table: str,
    columns: list[str],
    lengths: dict[str, int] | None = None,
    default_type: str = "VARCHAR(65535)",
) -> list[str]:
    """Emit the warehouse ALTERs for new columns (S8's DDL side).

    With length stats, sizes columns to the observed max (padded to
    the next power of two) instead of VARCHAR(max) — a real win on
    Redshift where wide VARCHARs inflate in-memory width.
    """
    stmts = []
    for c in columns:
        if lengths and lengths.get(c):
            n = 1
            while n < lengths[c]:
                n *= 2
            coltype = f"VARCHAR({max(n, 16)})"
        else:
            coltype = default_type
        stmts.append(f'ALTER TABLE {table} ADD COLUMN "{c}" {coltype}')
    return stmts


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/pad a batch to a target schema (missing → NULL typed,
    extra columns dropped) — the write-side half of evolution."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f"`{f.name}`").cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
