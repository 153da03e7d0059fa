"""Banded time-proximity join: exactness vs. brute force."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators.interval import (
    range_band_join,
    time_proximity_pairs,
)

UTC = dt.timezone.utc


def test_time_proximity_matches_bruteforce(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (i, i % 5, base + dt.timedelta(seconds=rng.randint(0, 600)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    gap_us = 60_000_000
    got = {
        (r.id_a, r.id_b, r.gap_us)
        for r in time_proximity_pairs(df, "user_id", "event_id", "ts", gap_us).collect()
    }
    expect = set()
    for (ia, ka, ta), (ib, kb, tb) in itertools.combinations(rows, 2):
        d = abs(int((ta - tb).total_seconds() * 1_000_000))
        if ka == kb and d <= gap_us:
            expect.add((min(ia, ib), max(ia, ib), d))
    assert got == expect


def test_time_proximity_band_boundary(spark):
    # pair exactly at the gap limit, straddling a band boundary
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    df = spark.createDataFrame(
        [
            (1, 1, base + dt.timedelta(microseconds=59_999_999)),
            (2, 1, base + dt.timedelta(microseconds=119_999_999)),
            (3, 1, base + dt.timedelta(microseconds=240_000_000)),
        ],
        ["event_id", "user_id", "ts"],
    )
    got = {
        (r.id_a, r.id_b)
        for r in time_proximity_pairs(df, "user_id", "event_id", "ts", 60_000_000).collect()
    }
    assert got == {(1, 2)}


def test_range_band_join_assigns_tiers(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0), (4, -1.0)], ["id", "v"]
    )
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 100.0, "mid"), (100.0, 1000.0, "high")],
        ["lo", "hi", "tier"],
    )
    out = {r.id: r.tier for r in range_band_join(facts, bands, "v").collect()}
    assert out == {1: "low", 2: "mid", 3: "high", 4: None}


def test_interval_overlap_join_matches_quadratic(spark):
    # banded overlap join == exact theta-join on random-ish intervals,
    # including band-straddling and multi-band-spanning cases
    from kissmetrics_to_database_spark.operators import interval as iv

    lrows = [(i, (i * 37) % 100, (i * 37) % 100 + (i * 13) % 40)
             for i in range(30)]
    rrows = [(j, (j * 53) % 110, (j * 53) % 110 + 25) for j in range(12)]
    left = spark.createDataFrame(lrows, ["lid", "s_us", "e_us"])
    right = spark.createDataFrame(rrows, ["rid", "b_s_us", "b_e_us"])
    got = {
        (r["lid"], r["rid"])
        for r in iv.interval_overlap_join(
            left, right, band_us=16,
            l_start="s_us", l_end="e_us",
            r_start="b_s_us", r_end="b_e_us",
        ).collect()
    }
    want = {
        (li, rj)
        for li, ls, le in lrows
        for rj, rs, re_ in rrows
        if ls < re_ and rs <= le  # [s,e] x [s,e) overlap
    }
    assert got == want and want  # non-trivial case set
