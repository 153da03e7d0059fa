"""Privacy / release-governance audits over corpus and event tables.

k-anonymity (Sweeney 2002): a release is k-anonymous when every
quasi-identifier combination (the columns an attacker can link
externally — type, date, coarse value bands) covers at least k
records. l-diversity (Machanavalli et al. 2007) additionally requires
at least l distinct SENSITIVE values inside each group, so a group
can't be k-large yet reveal one user's identity by uniformity.

These audits are the pre-release gate of a training-data pipeline:
before an events extract or a document dump ships, the governance
pass enumerates the violating groups (not just a boolean) so the
offending slices can be suppressed or generalized.

Engineering shape (100 TB): ONE hash-partitioned groupBy on the
quasi-identifier tuple with map-side partial aggregation — count and
countDistinct(sensitive) both combine partially; output is
group-cardinality-sized, and the violation filter cuts it further.
Nothing pairwise, nothing driver-side.

Reference anchor: none — beyond-reference governance surface
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 3,
    violations_only: bool = True,
) -> DataFrame:
    """Per quasi-identifier group: row count, distinct-sensitive
    count, and the two flags. ``violations_only`` keeps just the
    groups failing either bar (the actionable output)."""
    out = (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
        )
        .withColumn("k_anonymous", F.col("n_rows") >= k)
        .withColumn("l_diverse", F.col("n_sensitive") >= l_div)
    )
    if violations_only:
        out = out.where(~F.col("k_anonymous") | ~F.col("l_diverse"))
    return out
