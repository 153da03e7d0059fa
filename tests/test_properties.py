"""Property-based checks (hypothesis) — SURVEY.md §5.3.

Driver-side properties run many examples; the Spark round-trip
property keeps a small example budget (each example is a full CC
job)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kissmetrics_to_database_spark.functions import events_transform as et
from kissmetrics_to_database_spark.operators import identity
from kissmetrics_to_database_spark.sources import ndjson

from .test_identity import _cc_python


@given(st.text(min_size=1, max_size=30))
def test_sanitize_key_idempotent_and_clean(s):
    once = et.sanitize_key(s)
    assert et.sanitize_key(once) == once  # idempotent
    assert not re.search(r"[- ]", once)  # no separators survive


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=20))
def test_natural_key_orders_numerically(nums):
    names = [f"{n}.json" for n in nums]
    ordered = sorted(names, key=ndjson.natural_key)
    assert [int(x.split(".")[0]) for x in ordered] == sorted(nums)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),  # keys, incl. a hot key case
            st.integers(min_value=-(10**7), max_value=10**7),  # ts (µs)
        ),
        min_size=2,
        max_size=30,
    ),
    st.sampled_from([1, 1000, 250_000, 3_000_000]),  # gap widths (µs)
)
@settings(max_examples=5, deadline=None)
def test_banded_interval_join_matches_quadratic(spark, rows, gap_us):
    """The banded time-proximity join is exactly the quadratic
    self-join (recall AND precision 1.0) — pins the pigeonhole
    exactness proof (interval.py) with randomized inputs, including
    negative timestamps (floor-banding must not break below epoch)
    and duplicate timestamps."""
    from pyspark.sql import functions as F

    from kissmetrics_to_database_spark.operators import interval

    data = [(k, i, ts) for i, (k, ts) in enumerate(rows)]
    df = spark.createDataFrame(data, ["key", "id", "us"]).select(
        "key", "id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        (r["id_a"], r["id_b"], r["gap_us"])
        for r in interval.time_proximity_pairs(df, "key", "id", "ts", gap_us).collect()
    }
    expected = set()
    for (ka, ia, ta) in data:
        for (kb, ib, tb) in data:
            if ka == kb and ia < ib and abs(ta - tb) <= gap_us:
                expected.add((ia, ib, abs(ta - tb)))
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
        ).filter(lambda v: any(v)),  # no zero vectors (undefined cosine)
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.5, 0.9, 0.99]),
)
@settings(max_examples=5, deadline=None)
def test_cosine_near_pairs_matches_brute_force(spark, vecs, threshold):
    """Cell-blocked cosine near-dup pairs == the O(n²) brute force —
    pins the lossless-blocking recall proof (similarity.py) with
    randomized vectors and thresholds."""
    import math

    from kissmetrics_to_database_spark.operators import similarity

    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity.cosine_near_pairs(df, threshold).collect()
    }
    expected = {}
    for ia, va in data:
        for ib, vb in data:
            if ia >= ib:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            score = round(
                dot
                / (math.sqrt(sum(x * x for x in va)) * math.sqrt(sum(x * x for x in vb))),
                6,
            )
            if score >= threshold:
                expected[(ia, ib)] = score
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=5, deadline=None)
def test_cc_matches_union_find(spark, pairs):
    edges = [(f"v{a}", f"v{b}") for a, b in pairs if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["member"]: r["component_id"]
        for r in identity.connected_components(df).collect()
    }
    assert got == _cc_python(edges)
