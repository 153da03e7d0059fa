"""Probabilistic record linkage — Fellegi & Sunter (1969), the model
behind production Spark linkers (Splink's architecture is exactly
this shape: blocked candidate generation + per-field m/u log-weights
+ oversized-block exclusion).

The dedup suite answers "are these two documents the same BYTES /
the same TOKEN SET?"; record linkage answers the softer entity
question — "do these two records describe the same underlying
thing?" — by scoring an agreement VECTOR over typed fields instead
of thresholding one similarity. Per field f the evidence weight is

    agree(f):     log2(m_f / u_f)
    disagree(f):  log2((1 - m_f) / (1 - u_f))

where m_f = P(fields agree | same entity) — a model constant — and
u_f = P(fields agree | different entities) — the CHANCE-agreement
rate, estimated from the data itself as sum_v (n_v / N)^2 (the
probability two random records share value v, summed over values;
the standard frequency-based u estimate). A pair's match weight is
the sum over fields; pairs above a threshold are linked.

Engineering shape (100 TB):
  * Candidate pairs come from a UNION OF BLOCKING RULES (equi-joins
    on derived keys), never an all-pairs product.
  * A fixed-cardinality blocking key is quadratic by construction
    (every block grows O(n)), so every rule here carries a
    ``max_block`` guard: blocks holding more than ``max_block``
    records are EXCLUDED from candidate generation — the Splink
    "blocking rules that are too loose" treatment. That bounds total
    candidates at n * max_block regardless of corpus size; what it
    costs is pairs inside mega-blocks, which are precisely the pairs
    whose blocking key carries the least evidence (chance agreement
    on a near-universal value).
  * u-probabilities are one skinny aggregate per field (map-side
    combined, value-cardinality-sized) crossed in as a broadcast
    1-row frame; block keep-lists are aggregates of the same shape,
    joined back broadcast-style by Catalyst/AQE.
  * Scoring is a pure codegen projection over the candidate rows.

Determinism: u values are rounded to 9 dp before entering log2 and
the final weight to 6 dp, so the DuckDB oracle replays the identical
doubles (repo-wide round-before-use convention). The disagree
numerators embed the Python double ``1.0 - m`` (not the decimal
literal) for bit parity with the Spark expression.

Reference anchor: none — beyond-reference extension surface
(SURVEY.md north-star: training-data / entity-resolution tooling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import dedup

# P(agree | same entity) per field: how often a true duplicate pair
# preserves the field. Model constants in the Fellegi-Sunter sense —
# tunable, not estimated here (estimating m needs labels or EM).
M_PROBS = {"lang": 0.95, "source": 0.90, "band": 0.85, "head": 0.70}

BAND_CHARS = 32  # length-band width for the band field / blocking
MAX_BLOCK = 50  # blocks larger than this are excluded (see module doc)

_FIELDS = ("lang", "source", "band", "head")


def field_table(docs: DataFrame) -> DataFrame:
    """Typed comparison fields per record: language, source, 32-char
    length band, first normalized token (blocking salt), and the
    3-token normalized head. Map-only."""
    toks = dedup.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / F.lit(BAND_CHARS))
        .cast("long")
        .alias("band"),
        toks.getItem(0).alias("tok1"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head"),
    )


def u_probabilities(fields: DataFrame) -> DataFrame:
    """Chance-agreement probability per field as a 1-row frame:
    u_f = sum_v (n_v / N)^2, rounded to 9 dp. One skinny aggregate
    per field (value-cardinality-sized shuffle, map-side combined).

    Counts square-and-sum in DOUBLE: integer-valued doubles add
    exactly (and order-independently) while the partials stay under
    2^53, and a bigint product would overflow long before that."""
    out = None
    for f in _FIELDS:
        counts = fields.groupBy(f).agg(
            F.count("*").cast("double").alias("_n")
        )
        u = counts.agg(
            F.round(
                F.sum(F.col("_n") * F.col("_n"))
                / (F.sum("_n") * F.sum("_n")),
                9,
            ).alias(f"u_{f}")
        )
        out = u if out is None else out.crossJoin(F.broadcast(u))
    return out


def _blocked_pairs(
    fields: DataFrame, keys: list[str], max_block: int
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from one blocking rule: records
    sharing the key tuple, restricted to blocks of <= max_block
    records. The keep-list is a HAVING'd aggregate; candidates are an
    equi-self-join within kept blocks only."""
    kept = (
        fields.groupBy(*keys)
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") <= max_block)
        .drop("_c")
    )
    a = fields.join(kept, keys).select(
        *keys, F.col("doc_id").alias("doc_a")
    )
    b = fields.select(*keys, F.col("doc_id").alias("doc_b"))
    return a.join(b, keys).where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b"
    )


def record_linkage_pairs(
    docs: DataFrame,
    threshold: float = 6.0,
    max_block: int = MAX_BLOCK,
) -> DataFrame:
    """Linked record pairs with their agreement vector and
    Fellegi-Sunter match weight.

    Blocking rules (union, pair-deduped, each max_block-guarded):
      B1: equal non-empty 3-token head            — content-keyed;
      B2: equal (lang, length band, first token)  — structure keyed,
          salted with a content token, catches same-entity records
          whose head drifted after the first word.

    Returns (doc_a, doc_b, agree_lang, agree_source, agree_band,
    agree_head, match_weight) for pairs with weight >= threshold,
    doc_a < doc_b.
    """
    fields = field_table(docs)
    b1 = _blocked_pairs(
        fields.where(F.col("head") != ""), ["head"], max_block
    )
    b2 = _blocked_pairs(fields, ["lang", "band", "tok1"], max_block)
    pair_ids = b1.unionByName(b2).distinct()
    cand = pair_ids.join(
        fields.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f).alias(f"{f}_a") for f in _FIELDS],
        ),
        "doc_a",
    ).join(
        fields.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f).alias(f"{f}_b") for f in _FIELDS],
        ),
        "doc_b",
    )
    scored = cand.crossJoin(F.broadcast(u_probabilities(fields)))
    weight = F.lit(0.0)
    agrees = {}
    for f, m in M_PROBS.items():
        agree = F.col(f"{f}_a") == F.col(f"{f}_b")
        agrees[f] = agree
        u = F.col(f"u_{f}")
        weight = weight + F.when(agree, F.log2(F.lit(m) / u)).otherwise(
            F.log2(F.lit(1.0 - m) / (F.lit(1.0) - u))
        )
    return scored.select(
        "doc_a",
        "doc_b",
        agrees["lang"].alias("agree_lang"),
        agrees["source"].alias("agree_source"),
        agrees["band"].alias("agree_band"),
        agrees["head"].alias("agree_head"),
        F.round(weight, 6).alias("match_weight"),
    ).where(F.col("match_weight") >= threshold)
