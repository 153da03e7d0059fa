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
