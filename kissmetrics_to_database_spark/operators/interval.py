"""Interval / time-proximity joins — banded, never O(n²).

The reference has no temporal joins (SURVEY §2.3: only equi-joins and
the identity closure), but an events pipeline at scale constantly
needs "rows within Δt of each other" — near-duplicate event
detection, bot-burst detection, session stitching across sources.

The naive formulation is a non-equi self-join (`abs(ts_a - ts_b) ≤
g`), which Spark can only execute as a broadcast nested-loop or a
cartesian per key — quadratic in the hot keys. The classic scalable
rewrite is *banding*: bucket time into width-``g`` bands, equi-join
on ``(key, band)`` with one side expanded to its own and the next
band, then filter exactly. Any pair within ``g`` differs by at most
one band (pigeonhole), so recall is exact; the equi-join shuffles on
``(key, band)`` and whole-stage codegen handles the residual filter.
Cost goes from O(n² per key) to O(band population²) — and band
population is bounded by event rate × g, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_proximity_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str,
    max_gap_us: int,
) -> DataFrame:
    """All unordered pairs of rows sharing ``key_col`` whose
    timestamps differ by at most ``max_gap_us`` microseconds.

    Returns ``(id_a, id_b, gap_us)`` with ``id_a < id_b``. Exact
    (recall and precision 1.0 vs. the quadratic self-join) — the
    banding is purely a physical optimization.
    """
    us = F.unix_micros(F.col(ts_col))
    band = F.floor(us / F.lit(max_gap_us))
    left = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_ida"),
        us.alias("_usa"),
        F.explode(F.array(band, band + 1)).alias("_band"),
    )
    right = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_idb"),
        us.alias("_usb"),
        band.alias("_band"),
    )
    gap = F.abs(F.col("_usa") - F.col("_usb"))
    return (
        left.join(right, ["_k", "_band"])
        .where((F.col("_ida") != F.col("_idb")) & (gap <= max_gap_us))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            gap.alias("gap_us"),
        )
        .distinct()
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Classic band join: assign each fact row the dimension row whose
    ``[lo, hi)`` range contains ``value_col``.

    For a small band table (tax brackets, value tiers, SLA classes)
    the right plan is a broadcast of the dimension and a range
    predicate — Spark executes it as BroadcastNestedLoopJoin, which
    is linear in the fact table because the broadcast side is tiny.
    Kept as an operator so callers don't accidentally write it as a
    shuffled non-equi join.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return facts.join(F.broadcast(bands), cond, "left")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    band_us: int,
    l_start: str = "s_us",
    l_end: str = "e_us",
    r_start: str = "s_us",
    r_end: str = "e_us",
) -> DataFrame:
    """General interval-overlap equi-join via band decomposition —
    the two-sided generalization of :func:`time_proximity_pairs`.

    Each interval explodes into the ``band_us``-wide bands it covers
    (``sequence(floor(s/W), floor(e/W))``); overlapping intervals
    necessarily share a band, so the candidate join is an equi-join
    on the band id, then the exact predicate
    ``l.s < r.e AND r.s <= l.e`` filters and ``distinct`` collapses
    multi-band matches. Lossless: recall and precision 1.0 vs the
    quadratic theta-join, which Spark would otherwise execute as a
    nested-loop.

    ``band_us`` is the knob: ~ the typical interval length. Too small
    → wide explode fan-out; too large → fat band buckets. Replication
    is ceil(len/W)+1 per interval, and a pathological mega-interval
    is the skew case — cap or split upstream.

    Interval semantics: the left interval is CLOSED ``[s, e]``, the
    right HALF-OPEN ``[s, e)`` — the predicate is
    ``l.s < r.e AND r.s <= l.e`` (what calendar-window joins want:
    an activity span touching the start of an hour window overlaps
    it; one touching only its exclusive end does not).

    Returns all left columns + all right columns (callers alias to
    avoid collisions) for exactly the overlapping pairs.
    """
    lb = F.explode(
        F.sequence(
            F.floor(F.col(l_start) / band_us),
            F.floor(F.col(l_end) / band_us),
        )
    ).alias("_band")
    rb = F.explode(
        F.sequence(
            F.floor(F.col(r_start) / band_us),
            F.floor(F.col(r_end) / band_us),
        )
    ).alias("_band")
    lx = left.select("*", lb)
    rx = right.select("*", rb)
    joined = lx.join(rx, "_band").where(
        (lx[l_start] < rx[r_end]) & (rx[r_start] <= lx[l_end])
    )
    return joined.drop("_band").distinct()
