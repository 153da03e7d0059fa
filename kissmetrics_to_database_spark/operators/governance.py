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


_TWO_48 = float(1 << 48)


def laplace_noise(key: Column, scale: float) -> Column:
    """Deterministic Laplace(0, ``scale``) draw as a pure function of
    ``key``: the md5-derived 48-bit midpoint uniform (the same recipe
    as sampling.deterministic_uniform, replayable in any engine) fed
    through the Laplace inverse CDF
    ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)``.

    PRIVACY CONTRACT: the draw is only as unpredictable as ``key``.
    For any DP use the key MUST include a secret component held
    outside the release (an HMAC-style ``md5(secret || label)``) —
    a key derivable from published columns alone lets an adversary
    recompute and subtract the noise, which is no privacy at all.
    :func:`dp_noisy_counts` enforces this by requiring a
    ``release_key``. Determinism under a fixed secret key remains a
    *release* property: re-releasing the same group reuses the same
    draw instead of burning additional epsilon on replays.
    """
    v = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast(
        "double"
    )
    u = (v + F.lit(0.5)) / F.lit(_TWO_48)
    centered = u - F.lit(0.5)
    return (
        F.lit(-scale)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str | Column],
    epsilon: float = 0.5,
    *,
    release_key: str,
) -> DataFrame:
    """Epsilon-DP count-histogram release (Dwork et al. 2006 Laplace
    mechanism): per group, true count + Laplace(1/epsilon) noise,
    rounded to an integer and clamped at zero — the shape a
    governance pipeline publishes instead of raw per-slice counts.

    ``release_key`` is a REQUIRED secret per-release salt, held
    outside the release (a KMS secret, never a published column):
    the noise is an HMAC-style draw ``md5(release_key || label)``,
    unpredictable to anyone without the key yet bit-replayable by the
    release owner (re-releases reuse the draw instead of burning more
    epsilon). Keying on the public label alone would let an adversary
    recompute and subtract the noise — that mode is refused.

    Each row lands in exactly one group, so the histogram is a
    parallel composition: total privacy spend is epsilon (the max,
    not the sum, across groups). Sensitivity of each count is 1.

    Output: group columns, ``noisy_count`` (BIGINT), ``epsilon``.
    The true count and the release key never leave the plan.

    Engineering shape (100 TB): one hash-partitioned groupBy with
    map-side partial counts; the noise is a per-group codegen
    projection keyed on (secret, group label) — see
    :func:`laplace_noise`. Output is group-cardinality-sized;
    nothing driver-side.
    """
    if not release_key:
        raise ValueError(
            "dp_noisy_counts requires a non-empty secret release_key; "
            "noise derived from the public group label alone is "
            "recomputable by an adversary and provides no privacy"
        )
    grouped = df.groupBy(*group_cols)
    names = grouped.agg(F.count("*")).columns[:-1]
    key = F.concat_ws(
        "|", F.lit(release_key), *[F.col(c).cast("string") for c in names]
    )
    noise = laplace_noise(key, 1.0 / epsilon)
    return (
        grouped.agg(F.count("*").cast("double").alias("_n"))
        .select(
            *names,
            F.greatest(
                F.lit(0).cast("long"),
                F.round(F.col("_n") + noise, 0).cast("long"),
            ).alias("noisy_count"),
            F.lit(float(epsilon)).alias("epsilon"),
        )
    )


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
