"""Domain-targeted data selection: DSIR importance weights.

DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
arXiv:2302.03169) selects pretraining documents that look like a
small TARGET domain by scoring every raw document with the
log-likelihood ratio of two hashed-n-gram bag models:

    log w(x) = sum_{token t in x} [ log p_target(h(t)) - log p_raw(h(t)) ]

Documents with the highest weights are the most target-like; the
paper then Gumbel-resamples by weight (our deterministic A-ES sampler
`sampling.weighted_priority_sample` composes directly for that step).

Engineering shape (100 TB): the two feature distributions reduce to
``n_buckets`` rows each — a few KB — and broadcast to the scorers, so
scoring is one map-side join over the token stream plus one groupBy
per doc. Nothing quadratic, nothing driver-side. The bucket hash is
the md5-prefix family every deterministic operator here uses (NOT
Murmur3 ``F.hash``), so the DuckDB oracle replays the identical
bucketing and the weights are engine-exact.

Reference anchor: none — beyond-reference training-data surface
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_bucket(col: Column, hex_chars: int = 2) -> Column:
    """Stable feature bucket: the first ``hex_chars`` hex chars of
    md5 as an integer — ``16**hex_chars`` buckets.

    Power-of-16 bucket counts read the digest prefix directly (no
    mod), which keeps the DuckDB oracle a short nibble decode instead
    of a 64-bit mod dance; md5 prefixes are uniform so there is no
    bias. The paper-scale configuration (DSIR uses 10k buckets) maps
    to ``hex_chars=4`` (65 536); the catalog demo uses 2 (256), which
    is plenty for a unigram model on the test corpus.
    """
    return (
        F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10)
        .cast("long")
        .cast("int")
    )


def bucket_distribution(
    tok: DataFrame, hex_chars: int = 2, alpha: float = 1.0
) -> DataFrame:
    """(bucket, logp) for every bucket 0..16**hex_chars - 1 with
    Laplace smoothing: p_b = (c_b + alpha) / (N + alpha * n_buckets).

    Built off a (doc, token) stream; unseen buckets still get a row
    (via a sequence-generated bucket spine) so the scorer's join
    never drops a token.
    """
    n_buckets = 16 ** hex_chars
    counts = (
        tok.select(hashed_bucket(F.col("token"), hex_chars).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )
    spine = tok.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    full = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("c", F.lit(0)).alias("c")
    )
    tot = full.agg(F.sum("c").alias("n"))
    return (
        full.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                (F.col("c") + F.lit(alpha))
                / (F.col("n") + F.lit(alpha * n_buckets))
            ).alias("logp"),
        )
    )


def dsir_logratio_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    alpha: float = 1.0,
    ndigits: int = 6,
) -> DataFrame:
    """Per-document DSIR importance log-weight of ``raw`` docs toward
    the ``target`` domain. Returns (id, n_feats, log_weight) with
    log_weight rounded for engine-exact ranking.

    Features are hashed unigrams (the paper's default is hashed
    bigrams; unigrams keep the oracle SQL tractable and the bucket
    table shape is identical — swap the tokenizer to change order).

    Plan: two bucket distributions (broadcast, ``n_buckets`` rows
    each) → pre-joined into one (bucket, logratio) table → one
    broadcast equi-join against the raw token stream → one groupBy
    per doc. The token stream is scanned once and never joined to
    anything non-broadcast.
    """

    def _tokens(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token"),
        ).where(F.col("token") != "")

    raw_tok = _tokens(raw)
    ratio = (
        bucket_distribution(_tokens(target), hex_chars, alpha)
        .withColumnRenamed("logp", "logp_t")
        .join(
            bucket_distribution(raw_tok, hex_chars, alpha).withColumnRenamed(
                "logp", "logp_r"
            ),
            "bucket",
        )
        .select("bucket", (F.col("logp_t") - F.col("logp_r")).alias("logratio"))
    )
    return (
        raw_tok.withColumn(
            "bucket", hashed_bucket(F.col("token"), hex_chars)
        )
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("logratio"), ndigits).alias("log_weight"),
        )
    )


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-versioning diff between two corpus snapshots — the
    audit every release pipeline runs before shipping a new training
    set: per document id, classify as ``added`` (id only in new),
    ``removed`` (id only in old), ``modified`` (id in both, content
    hash differs) or ``unchanged``; plus byte accounting.

    Returns one row per status:
    (status, n_docs, n_chars_old, n_chars_new) — the shape of a
    dataset-card changelog entry. Content identity is md5 of the raw
    text (swap in ``normalization_fingerprint`` upstream for
    whitespace-robust identity).

    Plan: one full-outer join on the id (both sides hash-partitioned
    once) + a 4-row aggregation — linear, no windows, skew-free
    (ids are unique per side).
    """
    # Side presence is a literal flag, NOT the nullable content hash:
    # a doc present in both snapshots with NULL text on one side must
    # classify modified/unchanged, never added/removed. NULL text
    # hashes coalesce to a sentinel so the <> compare is total.
    o = old.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_po"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("\x00null")).alias("_ho"),
        F.coalesce(F.length(F.col(text_col)), F.lit(0)).alias("_lo"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_pn"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("\x00null")).alias("_hn"),
        F.coalesce(F.length(F.col(text_col)), F.lit(0)).alias("_ln"),
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_po").isNull(), "added")
        .when(F.col("_pn").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "modified")
        .otherwise("unchanged")
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce("_lo", F.lit(0)).alias("_lo"),
            F.coalesce("_ln", F.lit(0)).alias("_ln"),
        )
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_lo").cast("long").alias("n_chars_old"),
            F.sum("_ln").cast("long").alias("n_chars_new"),
        )
    )
