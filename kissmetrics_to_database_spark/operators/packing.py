"""Training-sequence packing: concat-and-chunk document → sequence
assignment, the step between a curated corpus and a pretraining data
loader.

Semantics (GPT-style packing): within each packing bucket, documents
are concatenated in ``id`` order and the token stream is chunked into
fixed-budget sequences. Each document is assigned the sequence its
first token lands in (``seq_id``) and its offset inside that sequence
(``seq_offset``); long documents simply span into following
sequences. Everything is a window cumulative sum — no UDFs, no
driver-side loop.

Scale design: the bucket column is the unit of parallelism. Packing
is inherently sequential *within* a stream (each doc's position
depends on every doc before it), so a 100 TB corpus is packed as many
independent hash buckets — one shuffle on the bucket key, then a
per-partition sort + running sum, both codegen'd. Bucket count trades
off packing locality vs. parallelism exactly like output-file count
in a lake writer. The reference has no analog (it is a row-at-a-time
loader); this is part of the beyond-reference training-data suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    bucket_col: str = "bucket",
    budget: int = 2048,
) -> DataFrame:
    """Assign each doc its packed training sequence.

    Returns the input columns plus ``seq_id`` (0-based sequence index
    within the bucket whose first token belongs to this doc) and
    ``seq_offset`` (token offset of the doc inside that sequence).
    Deterministic: order is (bucket, id), integers end-to-end.
    """
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return docs.select(
        id_col,
        bucket_col,
        token_col,
        F.floor(cum_excl / budget).cast("long").alias("seq_id"),
        (cum_excl % budget).cast("long").alias("seq_offset"),
    )


def sequence_stats(
    packed: DataFrame,
    bucket_col: str = "bucket",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-(bucket, seq_id) packing summary: docs starting in the
    sequence and their total tokens (> budget ⇒ the tail spills into
    the next sequence; the data loader truncates at the boundary)."""
    return packed.groupBy(bucket_col, "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("seq_tokens"),
    )


def source_temperature_weights(
    docs: DataFrame,
    source_col: str = "source",
    token_col: str = "n_tokens",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled multinomial source-mixing weights.

    ``p_s ∝ (tokens_s)^alpha`` — the standard corpus-balancing rule
    (alpha=1 is proportional sampling, alpha→0 uniform; 0.3 is the
    multilingual-pretraining convention). Returns per source:
    ``n_docs``, ``n_tokens``, ``weight`` (rounded 6dp). The per-source
    aggregate is tiny at any corpus size, so the normalizing total is
    a broadcast cross join, not a single-partition window.
    """
    per_src = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
        F.pow(F.sum(token_col).cast("double"), F.lit(alpha)).alias("_w"),
    )
    total = per_src.agg(F.sum("_w").alias("_tw"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("_w") / F.col("_tw"), 6).alias("weight"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    chunk_size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window chunk spans per document (stride < chunk_size
    ⇒ overlapping chunks, the retrieval/pretraining convention).

    Returns (id, chunk_id, start_tok, chunk_len): chunk k covers
    tokens [k·stride, k·stride + chunk_len) with chunk_len =
    min(chunk_size, n_tokens − k·stride). Zero-token docs emit no
    chunks. Pure per-row ``sequence``+``explode`` — embarrassingly
    parallel, no shuffle, no state; output size is Σ⌈n/stride⌉.
    """
    n = F.col(token_col).cast("long")
    starts = F.when(
        n > 0, F.sequence(F.lit(0).cast("long"), n - 1, F.lit(stride).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return docs.select(
        id_col,
        F.explode(starts).alias("start_tok"),
        n.alias("_n"),
    ).select(
        id_col,
        (F.col("start_tok") / stride).cast("long").alias("chunk_id"),
        "start_tok",
        F.least(F.lit(chunk_size).cast("long"), F.col("_n") - F.col("start_tok")).alias(
            "chunk_len"
        ),
    )


def length_bucket_padding(
    docs: DataFrame,
    token_col: str = "n_tokens",
    min_len: int = 16,
    max_len: int = 4096,
) -> DataFrame:
    """Length-bucketed batching audit (r7): assign each document to
    the smallest power-of-two sequence length that holds it (clamped
    to [min_len, max_len]; longer docs truncate to max_len) and
    report, per bucket, the padding a bucketed data loader pays —
    plus what padding-to-global-max WOULD cost, the number that
    justifies bucketing at all (dynamic batching / bucketed sampler,
    the standard fine-tuning efficiency lever).

    Power-of-two arithmetic is INTEGER-exact on both engines: the
    bucket comes from the bit length (``length(bin(n))``) and a
    shift — never from float log2, whose log(n)/log(2) rounding can
    misclassify exact powers of two.

    Returns per bucket: (bucket_len, n_docs, sum_tokens [truncated],
    padded_tokens = bucket_len·n_docs, waste_ratio, n_truncated,
    trunc_tokens). One groupBy on a ≤log₂(max/min)-cardinality key —
    map-side combinable, skew-free by construction.
    """
    n = F.greatest(F.col(token_col).cast("long"), F.lit(1))
    staged = docs.select(
        n.alias("_n"), F.length(F.bin(n)).alias("_bits")
    )
    # PySpark's shiftleft() wrapper takes only literal bit counts, so
    # the column-shift goes through F.expr (Catalyst's ShiftLeft
    # accepts expressions on both sides)
    pot = F.when(
        F.col("_n") == F.expr("shiftleft(1L, _bits - 1)"), F.col("_n")
    ).otherwise(F.expr("shiftleft(1L, _bits)"))
    bucket = F.greatest(
        F.lit(min_len).cast("long"),
        F.least(pot, F.lit(max_len).cast("long")),
    )
    eff = F.least(F.col("_n"), F.lit(max_len).cast("long"))
    return (
        staged.select(
            bucket.alias("bucket_len"),
            eff.alias("_eff"),
            (F.col("_n") > max_len).cast("long").alias("_tr"),
            F.greatest(
                F.col("_n") - max_len, F.lit(0).cast("long")
            ).alias("_trtok"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_eff").cast("long").alias("sum_tokens"),
            (F.first("bucket_len") * F.count("*"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                1
                - F.sum("_eff")
                / (F.first("bucket_len") * F.count("*")).cast("double"),
                6,
            ).alias("waste_ratio"),
            F.sum("_tr").cast("long").alias("n_truncated"),
            F.sum("_trtok").cast("long").alias("trunc_tokens"),
        )
    )
