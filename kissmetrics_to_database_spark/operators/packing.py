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
