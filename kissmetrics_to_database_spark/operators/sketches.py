"""Probabilistic sketches — the fixed-size-state answers to questions
that are otherwise corpus-sized shuffles.

At 100 TB the difference between "count distinct users per event" and
"hold 256 bytes per group" is the job succeeding: these operators trade
bounded, quantifiable error for state whose size is a CONSTANT of the
sketch configuration, independent of the data. All three use the same
split-one-hash md5 family as the dedup suite (one digest per value;
position j reads hex chars ``[4j+1 .. 4j+4]``), so every sketch is
deterministic, engine-portable, and expressible as the DuckDB oracle
SQL that doubles as its spec.

Extension surface (no reference analog — the reference's PHP pipeline
counts exactly, which is exactly what stops scaling; cf.
``KissmetricsToDatabase.php`` row-count bookkeeping at :788-808):

- Count-min sketch: heavy-hitter frequency estimation in
  ``depth × width`` counters. Never underestimates.
- HyperLogLog: per-group distinct counts in ``2^b`` registers with
  linear-counting small-range correction.
- Bloom filter: set membership in a ``bits``-wide bitmap; broadcast
  it and an anti-join against a billion-row build side becomes a
  map-only probe. No false negatives.

Shared conventions: values hash once via md5; bit positions / buckets
come from 16-bit hex slices; bitmap words are 32-bit (stored in
BIGINT — DuckDB's ``<<`` overflows at bit 63, and 31 keeps every mask
positive in both engines); all floating-point outputs round to 6
digits so summation order never leaks into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_slice(h, j: int, nchars: int = 4):
    """Integer value of hex chars [nchars*j+1 .. nchars*(j+1)] of digest
    column ``h`` — the split-one-hash family's j-th hash function."""
    return F.conv(F.substring(h, nchars * j + 1, nchars), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_counters(
    df: DataFrame,
    value_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build count-min counters over value OCCURRENCES (multiset).

    Each row hashes once (md5); hash row ``d`` buckets it at
    ``hex[4d+1..4d+4] % width``. The only shuffle is the
    ``(d, bucket)`` groupBy — map-side partial_count combines first,
    so at most ``depth × width`` rows ever cross the wire no matter
    the corpus size. Returns (d, bucket, cnt): the sketch, ≤
    ``depth*width`` rows, broadcastable by construction.
    """
    assert depth * 4 <= 32, "md5 slices: depth <= 8"
    h = F.md5(F.col(value_col).cast("string"))
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_hex_slice(h, d) % width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_r")
    ).select("_r.d", "_r.bucket")
    return rows.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def cms_estimate(
    items: DataFrame,
    counters: DataFrame,
    value_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch: estimate = min over hash rows of the
    counter at that row's bucket (0 where the bucket is empty).

    The counters broadcast (≤ depth×width rows); the probe side never
    shuffles except the per-item min rollup. Estimates can only
    OVERcount (collisions add, never subtract) — ``est_cnt >=``
    the true count, always. Returns (value, est_cnt).
    """
    h = F.md5(F.col(value_col).cast("string"))
    probes = items.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_hex_slice(h, d) % width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_r"),
    ).select(value_col, "_r.d", "_r.bucket")
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group approximate distinct count in ``m = 2^b`` registers.

    Register index = first ``b/4`` hex chars of md5(value); rank
    ``rho`` = 1 + leading zeros of the next 24 bits (via
    ``25 - length(bin(rest))`` — ``bin`` strips leading zeros
    identically in Spark and DuckDB). Two aggregations, both with
    map-side combine: (group, register) -> max(rho), then group ->
    the harmonic sum. Per-group state is m registers — 256 bytes at
    b=8 — regardless of group size; the classic Flajolet et al. 2007
    estimator with linear-counting small-range correction.

    Returns (group, hll_n): the rounded estimate.
    """
    regs = hll_registers(df, group_col, value_col, b)
    return hll_estimate(regs, group_col, b, ndigits)


def hll_registers(
    df: DataFrame, group_col: str, value_col: str, b: int = 8
) -> DataFrame:
    """The HLL state: (group, register, mrho) with ``mrho`` the max
    rank seen in that register. Registers MERGE by max — across
    partitions, across micro-batches, across days — which is what
    makes the sketch streaming- and union-compatible: max is
    associative, commutative, idempotent. A plain streaming
    ``groupBy(...).agg(max(...))`` maintains this incrementally."""
    assert b % 4 == 0 and 0 < b <= 16, "register bits: multiple of 4, <= 16"
    h = F.md5(F.col(value_col).cast("string"))
    rest = F.conv(F.substring(h, b // 4 + 1, 6), 16, 10).cast("long")
    rho = F.when(rest == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.bin(rest))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            _hex_slice(h, 0, b // 4).alias("register"),
            rho.alias("rho"),
        )
        .groupBy(group_col, "register")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: str | list[str],
    b: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Collapse (group, register, mrho) state into the per-group
    estimate (Flajolet alpha_m correction + linear counting).
    ``group_cols`` may be one column name or several (r10, ADVICE
    fix) — composite keys stay real columns through the aggregate,
    never packed into a delimited string whose delimiter a group
    value could contain."""
    cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("mrho")))
            + (F.lit(float(m)) - F.count("*"))
        ).alias("_z"),
        (F.lit(m) - F.count("*")).cast("long").alias("_zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("_z")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_zeros")),
    ).otherwise(raw)
    return agg.select(*cols, F.round(est, ndigits).alias("hll_n"))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_bitmap(
    df: DataFrame,
    value_col: str,
    bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom bitmap over the values: ``k`` md5-slice positions
    per value, OR-ed into 32-bit words. Returns (word, bm) — at most
    ``bits/32`` rows (8 KB of longs at the 2^16 default, ~4 MB at
    2^30), broadcastable at any corpus size. The groupBy combines
    map-side (partial bit_or), so wire traffic is bounded by the
    bitmap width, not the build cardinality.
    """
    assert k * 4 <= 32, "md5 slices: k <= 8"
    assert bits & (bits - 1) == 0, "bits must be a power of two"
    h = F.md5(F.col(value_col).cast("string"))
    rows = df.select(
        F.explode(
            F.array(*[(_hex_slice(h, j) % bits).alias(f"_p{j}") for j in range(k)])
        ).alias("pos")
    )
    return (
        rows.select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("_mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(_mask)").alias("bm"))
    )


def bloom_probe(
    probes: DataFrame,
    bitmap: DataFrame,
    id_col: str,
    value_col: str,
    bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Membership test against a built bitmap: present iff ALL ``k``
    bits are set. The bitmap broadcasts; the probe side's only
    shuffle is the per-id bool_and rollup. No false negatives ever;
    false positives at the standard ``(1 - e^{-kn/bits})^k`` rate.
    Returns (id, maybe_seen).
    """
    h = F.md5(F.col(value_col).cast("string"))
    rows = probes.select(
        F.col(id_col),
        F.explode(
            F.array(*[(_hex_slice(h, j) % bits).alias(f"_p{j}") for j in range(k)])
        ).alias("pos"),
    ).select(
        id_col,
        (F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("_mask"),
    )
    hit = F.coalesce(
        F.expr("(bm & _mask) != 0"), F.lit(False)
    )
    return (
        rows.join(F.broadcast(bitmap), "word", "left")
        .select(id_col, hit.alias("_hit"))
        .groupBy(id_col)
        .agg(F.expr("bool_and(_hit)").alias("maybe_seen"))
    )


# ---------------------------------------------------------------------------
# Equal-width histogram quantiles
# ---------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 256,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group quantile estimates from a ``bins``-cell equal-width
    histogram — the fixed-state alternative to sorting the values.

    Exact percentiles shuffle and sort every value per group; at
    100 TB that is the whole column through the wire. Here the state
    per group is ``bins`` counters: pass 1 takes (min, max, n) per
    group, pass 2 bins map-side (partial_count combine) so at most
    ``groups × bins`` rows shuffle. The estimate interpolates inside
    the covering bin: with ``t = p·n`` and ``cum`` the cumulative
    count through the bin, ``est = lo + (t - cum_before)/cnt · w``.
    Error is bounded by one bin width — tight whenever the
    distribution isn't spiked inside a single bin.

    Every arithmetic step is IEEE double add/sub/mul/div on exact
    inputs — bit-identical across engines, no rounding games needed
    (``round`` at the end is cosmetic). Degenerate groups
    (``max == min``) estimate the constant exactly.

    Returns (group, p, est) for each requested quantile.
    """
    g, v = F.col(group_col), F.col(value_col).cast("double")
    vals = df.where(v.isNotNull()).select(g.alias(group_col), v.alias("_v"))
    stats = vals.groupBy(group_col).agg(
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
        F.count("*").cast("long").alias("_n"),
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    binned = (
        vals.join(F.broadcast(stats), group_col)
        .select(
            group_col,
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col("_v") - F.col("_mn")) / width).cast("int"),
                )
            )
            .alias("bin"),
        )
        .groupBy(group_col, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = binned.withColumn("cum", F.sum("cnt").over(wcum))
    targets = stats.select(
        group_col,
        "_mn",
        "_mx",
        "_n",
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
    ).withColumn("t", F.col("p") * F.col("_n"))
    cand = targets.join(hist, group_col).where(F.col("cum") >= F.col("t"))
    wfirst = Window.partitionBy(group_col, "p").orderBy("bin")
    first = cand.withColumn("_rn", F.row_number().over(wfirst)).where(
        F.col("_rn") == 1
    )
    width_f = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    est = F.when(F.col("_mx") == F.col("_mn"), F.col("_mn")).otherwise(
        F.col("_mn")
        + F.col("bin") * width_f
        + (F.col("t") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
        * width_f
    )
    return first.select(
        group_col, "p", F.round(est, ndigits).alias("est")
    )


def hll_pairwise_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Cross-group audience overlap from MERGEABLE HLL state (r9):
    for every unordered group pair, estimate the union cardinality by
    max-merging the two register sets (the defining property of the
    sketch — no raw values re-read) and the intersection by
    inclusion-exclusion |A| + |B| - |A u B|.

    This is the sketch operation a 100 TB pipeline actually runs:
    per-group register state (m = 2^b rows each) is built ONCE from
    one corpus scan; every pairwise union after that is G^2 * m-row
    work on the skinny state table, never a second corpus pass. The
    pair fan-out joins the G-row group list broadcast-side; registers
    max-combine map-side.

    Returns (group_a, group_b, hll_a, hll_b, hll_union, est_overlap),
    group_a < group_b. Estimates round to ``ndigits`` with exact
    register harmonic sums (engine-reproducible, see hll_distinct);
    inclusion-exclusion on small overlaps can go <= 0 — reported as
    computed, the honest sketch readout.
    """
    regs = hll_registers(df, group_col, value_col, b)
    singles = hll_estimate(regs, group_col, b, ndigits)
    groups = regs.select(group_col).distinct()
    pairs = groups.select(F.col(group_col).alias("group_a")).join(
        groups.select(F.col(group_col).alias("group_b")),
        F.col("group_a") < F.col("group_b"),
    )
    merged = (
        regs.join(
            F.broadcast(pairs),
            (F.col(group_col) == F.col("group_a"))
            | (F.col(group_col) == F.col("group_b")),
        )
        .groupBy("group_a", "group_b", "register")
        .agg(F.max("mrho").alias("mrho"))
    )
    # (group_a, group_b) stays a real composite key through the
    # estimate (r10, ADVICE fix) — the old concat_ws('|')/split round
    # trip mis-split any group value containing '|' and silently
    # dropped rows at the join-back, and broke non-string group types.
    union_est = hll_estimate(merged, ["group_a", "group_b"], b, ndigits)
    union_est = union_est.withColumnRenamed("hll_n", "hll_union")
    return (
        union_est.join(
            singles.select(
                F.col(group_col).alias("group_a"),
                F.col("hll_n").alias("hll_a"),
            ),
            "group_a",
        )
        .join(
            singles.select(
                F.col(group_col).alias("group_b"),
                F.col("hll_n").alias("hll_b"),
            ),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "hll_a",
            "hll_b",
            "hll_union",
            F.round(
                F.col("hll_a") + F.col("hll_b") - F.col("hll_union"),
                ndigits,
            ).alias("est_overlap"),
        )
    )
