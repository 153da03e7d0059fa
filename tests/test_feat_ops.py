"""Unit tests for the collocations / scd / selection / features
operators (wired into the catalog in round 4; VERDICT r3 item 1)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import (
    collocations,
    features,
    scd,
    selection,
)


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------


def test_bigrams_respect_doc_boundaries_and_empty_filter(spark):
    df = spark.createDataFrame(
        [(1, "  a b  c "), (2, "x"), (3, ""), (4, None)],
        "doc_id long, text string",
    ).where(F.col("text").isNotNull())
    rows = sorted(
        collocations.bigrams_long(df).collect(),
        key=lambda r: (r.doc_id, r.a, r.b),
    )
    # doc 1 yields (a,b),(b,c) despite ragged whitespace; docs 2/3
    # contribute nothing; no pair crosses doc 1 → doc 2.
    assert [(r.doc_id, r.a, r.b) for r in rows] == [
        (1, "a", "b"),
        (1, "b", "c"),
    ]


def test_pmi_exact_value(spark):
    # corpus: "a b" x4 in one doc + "a c b" — c appears once.
    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "a c b")],
        "doc_id long, text string",
    )
    out = collocations.pmi_collocations(df, min_count=4, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a, r.b, r.c_ab) == ("a", "b", 4)
    # n_bigrams = 7 + 2 = 9; n_tokens = 8 + 3 = 11; c_a = 5, c_b = 5
    expected = round(math.log((4 / 9) / ((5 / 11) * (5 / 11))), 6)
    assert r.pmi == pytest.approx(expected, abs=1e-9)


def test_kn_continuation_counts(spark):
    # bigram types: (a,b), (c,b), (b,a) → b follows 2 distinct lefts.
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c b")], "doc_id long, text string"
    )
    out = {
        r.word: r for r in collocations.kn_continuation_stats(df, k=10).collect()
    }
    # types with counts: (a,b):2, (b,a):1, (c,b):1 → n1=2 n2=1 n_types=3
    assert out["b"].continuation_count == 2
    assert out["a"].continuation_count == 1
    assert out["b"].p_continuation == pytest.approx(round(2 / 3, 6))
    assert out["b"].d_discount == pytest.approx(round(2 / (2 + 2.0), 6))


def test_kn_bigram_scores_hand_computed(spark):
    # corpus: doc1 "a b a b", doc2 "c b"
    # types: (a,b):2, (b,a):1, (c,b):1 → N1=2, N2=1, n_types=3, D=0.5
    # P(a,b) = (2-.5)/2 + (.5/2)*1*(2/3) = 0.916667
    # P(b,a) = (1-.5)/1 + (.5/1)*1*(1/3) = 0.666667
    # P(c,b) = (1-.5)/1 + (.5/1)*1*(2/3) = 0.833333
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c b")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in collocations.kn_bigram_logprob_scores(df).collect()
    }
    p_ab = 0.75 + 0.25 * (2 / 3)
    p_ba = 0.5 + 0.5 * (1 / 3)
    p_cb = 0.5 + 0.5 * (2 / 3)
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    exp2 = round(math.log(p_cb), 6)
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1
    assert out[1].mean_logprob == pytest.approx(exp1, abs=2e-6)
    assert out[2].mean_logprob == pytest.approx(exp2, abs=2e-6)
    # probabilities must be a proper distribution-ish: all in (0, 1]
    assert all(
        r.mean_logprob <= 0 for r in out.values()
    )


def test_kn_discount_null_when_no_rare_types(spark):
    # every bigram type occurs >= 3 times → N1 = N2 = 0 → the
    # Ney-Essen-Kneser discount is undefined and must surface as NULL,
    # not an ANSI divide-by-zero (sf0.1 bench regression)
    df = spark.createDataFrame(
        [(i, "x y x y x y") for i in range(3)], "doc_id long, text string"
    )
    out = collocations.kn_continuation_stats(df, k=10).collect()
    assert len(out) > 0
    assert all(r.d_discount is None for r in out)


# ---------------------------------------------------------------------------
# scd
# ---------------------------------------------------------------------------


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k string, attr string, ts long, seq long"
    )


def test_scd2_from_change_log_islands(spark):
    log = _log(
        spark,
        [
            ("u1", "A", 1, 1),
            ("u1", "A", 2, 2),  # no change → merges into version 1
            ("u1", "B", 3, 3),
            ("u1", "A", 4, 4),  # A again later → NEW version (type 2)
            ("u2", "X", 1, 5),
        ],
    )
    out = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    rows = sorted(out.collect(), key=lambda r: (r.k, r.version))
    u1 = [r for r in rows if r.k == "u1"]
    assert [(r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in u1] == [
        ("A", 1, 3, 1, False),
        ("B", 3, 4, 2, False),
        ("A", 4, None, 3, True),
    ]
    u2 = [r for r in rows if r.k == "u2"]
    assert [(r.attr, r.valid_to, r.is_current) for r in u2] == [
        ("X", None, True)
    ]


def test_scd2_merge_batch_all_branches(spark):
    log = _log(
        spark,
        [("u1", "A", 1, 1), ("u1", "B", 5, 2), ("u2", "X", 1, 3)],
    )
    dim = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    batch = spark.createDataFrame(
        # u1 changes B→C (close+open), u2 matches (unchanged),
        # u3 is brand new; u4 absent from dim and batch.
        [("u1", "C", 9), ("u2", "X", 9), ("u3", "Z", 9)],
        "k string, attr string, ts long",
    )
    out = scd.scd2_merge_batch(dim, batch, "k", "attr", "ts")
    rows = sorted(out.collect(), key=lambda r: (r.k, r.version))
    assert [(r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in rows] == [
        ("u1", "A", 1, 5, 1, False),   # closed history passes through
        ("u1", "B", 5, 9, 2, False),   # current closed at batch ts
        ("u1", "C", 9, None, 3, True), # new open version
        ("u2", "X", 1, None, 1, True), # unchanged current survives
        ("u3", "Z", 9, None, 1, True), # brand-new entity at version 1
    ]


def test_scd2_point_in_time_interval_semantics(spark):
    log = _log(
        spark,
        [("u1", "A", 10, 1), ("u1", "B", 20, 2), ("u2", "X", 10, 3)],
    )
    dim = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    facts = spark.createDataFrame(
        [
            (1, "u1", 10),  # boundary: exactly at first valid_from → A
            (2, "u1", 19),  # inside version 1 → A
            (3, "u1", 20),  # boundary: valid_to of v1 = valid_from of v2 → B
            (4, "u1", 99),  # open interval → B
            (5, "u2", 5),   # predates history → null attributes
            (6, "u3", 50),  # unknown entity → null attributes
        ],
        "fact_id long, k string, ts long",
    )
    out = {
        r.fact_id: (r.attr, r.version)
        for r in scd.scd2_point_in_time(dim, facts, "k", "ts").collect()
    }
    assert out == {
        1: ("A", 1),
        2: ("A", 1),
        3: ("B", 2),
        4: ("B", 2),
        5: (None, None),
        6: (None, None),
    }
    # every fact survives exactly once — intervals partition time
    assert len(out) == 6


def test_scd2_merge_noop_batch_is_identity(spark):
    log = _log(spark, [("u1", "A", 1, 1), ("u1", "B", 5, 2)])
    dim = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    empty = spark.createDataFrame([], "k string, attr string, ts long")
    out = scd.scd2_merge_batch(dim, empty, "k", "attr", "ts")
    assert sorted(out.collect()) == sorted(dim.collect())


# ---------------------------------------------------------------------------
# selection (DSIR)
# ---------------------------------------------------------------------------


def test_dsir_self_target_weights_zero(spark):
    # target == raw → identical distributions → every logratio is 0.
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta")],
        "doc_id long, text string",
    )
    out = selection.dsir_logratio_weights(docs, docs).collect()
    assert {r.doc_id: r.log_weight for r in out} == {1: 0.0, 2: 0.0}
    assert {r.doc_id: r.n_feats for r in out} == {1: 3, 2: 3}


def test_dsir_prefers_target_like_docs(spark):
    raw = spark.createDataFrame(
        [(1, "cat cat cat"), (2, "dog dog dog")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "cat cat cat cat")], "doc_id long, text string"
    )
    w = {
        r.doc_id: r.log_weight
        for r in selection.dsir_logratio_weights(raw, target).collect()
    }
    assert w[1] > w[2]  # the cat doc is more target-like


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------


def test_group_quantiles_names_and_values(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in [1, 2, 3, 4, 10]] + [("g", None)],
        "grp string, v double",
    )
    out = features.group_quantiles(df, "grp", "v").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert set(r) == {"grp", "q_05", "q_25", "q_50", "q_75", "q_95"}
    assert r["q_05"] == pytest.approx(1.2)
    assert r["q_50"] == 3.0
    assert r["q_95"] == pytest.approx(8.8)


def test_robust_scale_clamps_scores_and_passes_nulls(spark):
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 100], 1)]
        + [("g", 6, None)],
        "grp string, id long, v double",
    )
    out = {r.id: r for r in features.robust_scale(df, "grp", "v").collect()}
    # p05 = 1.2, p95 = 80.8, median = 3, IQR = 2
    assert out[1].clipped == -1 and out[1].value_w == pytest.approx(1.2)
    assert out[5].clipped == 1 and out[5].value_w == pytest.approx(80.8)
    assert out[2].clipped == 0 and out[2].rz == pytest.approx(-0.5)
    # the null row keeps null value_w/rz/clipped (least/greatest
    # null-skip regression: VERDICT r4 wiring fix)
    assert out[6].value_w is None and out[6].rz is None
    assert out[6].clipped is None


def test_robust_scale_zero_iqr_gives_null_rz(spark):
    df = spark.createDataFrame(
        [("g", i, 5.0) for i in range(4)], "grp string, id long, v double"
    )
    out = features.robust_scale(df, "grp", "v").collect()
    assert all(r.rz is None for r in out)
    assert all(r.clipped == 0 for r in out)


# ---------------------------------------------------------------------------
# properties (randomized, driver-computed references)
# ---------------------------------------------------------------------------


def test_scd2_merge_is_idempotent_on_random_logs(spark):
    # the warehouse MERGE contract: applying the SAME batch twice must
    # be a no-op the second time (replay safety for at-least-once
    # delivery into the dimension)
    import random

    rng = random.Random(42)
    rows = [
        (f"u{rng.randrange(6)}", rng.choice("ABC"), t, t)
        for t in range(40)
    ]
    log = _log(spark, rows)
    dim = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    batch = spark.createDataFrame(
        [("u0", "Z", 100), ("u1", "A", 100), ("u9", "N", 100)],
        "k string, attr string, ts long",
    )
    once = scd.scd2_merge_batch(dim, batch, "k", "attr", "ts")
    twice = scd.scd2_merge_batch(once, batch, "k", "attr", "ts")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_scd2_point_in_time_preserves_fact_cardinality(spark):
    # intervals partition time → the PIT join is 1:1 on facts, never
    # dropping or duplicating, for arbitrary logs and probe times
    import random

    rng = random.Random(7)
    rows = [
        (f"u{rng.randrange(5)}", rng.choice("ABCD"), t, t)
        for t in range(60)
    ]
    log = _log(spark, rows)
    dim = scd.scd2_from_change_log(log, "k", "attr", "ts", "seq")
    facts = spark.createDataFrame(
        [
            (i, f"u{rng.randrange(7)}", rng.randrange(-5, 70))
            for i in range(50)
        ],
        "fact_id long, k string, ts long",
    )
    out = scd.scd2_point_in_time(dim, facts, "k", "ts")
    assert out.count() == 50
    assert out.select("fact_id").distinct().count() == 50
    # spot-verify against a driver-side reference
    hist = {}
    for k, attr, ts, _ in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        hist.setdefault(k, [])
        if not hist[k] or hist[k][-1][1] != attr:
            hist[k].append((ts, attr))
    got = {r.fact_id: r.attr for r in out.collect()}
    for r in facts.collect():
        expect = None
        for start, attr in hist.get(r.k, []):
            if start <= r.ts:
                expect = attr
        assert got[r.fact_id] == expect, (r.fact_id, r.k, r.ts)


def test_ewma_forecast_hand_computed(spark):
    # one key, hourly counts 10, 10, 40: forecast for h2 with alpha=.3
    # is (10*1 + 10*0.7) / (1 + 0.7) = 10.0 -> ratio 4.0 -> anomaly;
    # forecast for h1 is 10/1 = 10 -> ratio 1.0 -> normal
    from datetime import datetime, timezone

    from kissmetrics_to_database_spark.operators import features as ft

    rows = []
    for h, n in [(0, 10), (1, 10), (2, 40)]:
        for i in range(n):
            rows.append(
                ("k", datetime(2024, 1, 1, h, i % 60, tzinfo=timezone.utc))
            )
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {
        r["hour"].hour: r
        for r in ft.ewma_forecast_anomalies(df, "event_type").collect()
    }
    assert 0 not in out  # no prior hours -> filtered
    assert out[1]["forecast"] == 10.0 and out[1]["is_anomaly"] is False
    assert out[2]["forecast"] == 10.0
    assert out[2]["ratio"] == 4.0 and out[2]["is_anomaly"] is True


def test_corpus_snapshot_diff_hand_computed(spark):
    from kissmetrics_to_database_spark.operators import selection

    old = spark.createDataFrame(
        [(1, "aaa"), (2, "bb"), (3, "c")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "bb"), (3, "changed"), (4, "dddd")], ["doc_id", "text"]
    )
    out = {
        r["status"]: (r["n_docs"], r["n_chars_old"], r["n_chars_new"])
        for r in selection.corpus_snapshot_diff(old, new).collect()
    }
    assert out == {
        "removed": (1, 3, 0),
        "unchanged": (1, 2, 2),
        "modified": (1, 1, 7),
        "added": (1, 0, 4),
    }


def _events_parquet(rows, prefix):
    """Write a single-file events.parquet (load_table expects the
    driver testdata shape: one parquet FILE per table)."""
    import os
    import tempfile

    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    d = tempfile.mkdtemp(prefix=prefix)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_retention_cohorts_matrix(spark):
    from kissmetrics_to_database_spark.plans import catalog

    rows = [
        # user 1: first event week of Jan 1 (Mon), active weeks 0,2
        (1, 1, "2024-01-02 10:00:00", "click", 1.0),
        (2, 1, "2024-01-16 10:00:00", "view", 1.0),
        # user 2: first event week of Jan 8, active weeks 0,1
        (3, 2, "2024-01-09 10:00:00", "click", 1.0),
        (4, 2, "2024-01-15 10:00:00", "click", 1.0),
        # user 3: same cohort as user 2, only week 0
        (5, 3, "2024-01-10 10:00:00", "view", 1.0),
    ]
    d = _events_parquet(rows, "kmdb_cohort_")
    out = {
        (r["cohort_week"], r["week_k"]): (r["n_active"], r["cohort_size"],
                                          r["retention"])
        for r in catalog.QUERIES["retention_cohorts"](spark, d).collect()
    }
    assert out[("2024-01-01", 0)] == (1, 1, 1.0)
    assert out[("2024-01-01", 2)] == (1, 1, 1.0)
    assert ("2024-01-01", 1) not in out
    assert out[("2024-01-08", 0)] == (2, 2, 1.0)
    assert out[("2024-01-08", 1)] == (1, 2, 0.5)


def test_attribution_linear_splits_credit(spark):
    from kissmetrics_to_database_spark.plans import catalog

    rows = [
        # purchase 100.0 with 1 click + 1 view inside 7d -> 50/50
        (1, 1, "2024-01-10 00:00:00", "click", 0.0),
        (2, 1, "2024-01-11 00:00:00", "view", 0.0),
        (3, 1, "2024-01-12 00:00:00", "purchase", 100.0),
        # touch OUTSIDE the 7d window -> purchase is 'direct'
        (4, 2, "2024-01-01 00:00:00", "click", 0.0),
        (5, 2, "2024-01-20 00:00:00", "purchase", 30.0),
        # same-user later touch must NOT attribute (t_ts < purchase ts)
        (6, 2, "2024-01-21 00:00:00", "view", 0.0),
    ]
    d = _events_parquet(rows, "kmdb_attr_")
    out = {
        r["touch_type"]: (r["credit"], r["n_touches"])
        for r in catalog.QUERIES["attribution_linear"](spark, d).collect()
    }
    assert out["click"] == (50.0, 1)
    assert out["view"] == (50.0, 1)
    assert out["direct"] == (30.0, 0)


def test_attribution_position_u_shape(spark):
    from kissmetrics_to_database_spark.plans import catalog

    rows = [
        # 4-touch journey, value 100: first/last 40 each, middles
        # share 20 (10 + 10)
        (1, 1, "2024-01-10 00:00:00", "click", 0.0),   # first  -> 40
        (2, 1, "2024-01-10 06:00:00", "view", 0.0),    # middle -> 10
        (3, 1, "2024-01-10 12:00:00", "view", 0.0),    # middle -> 10
        (4, 1, "2024-01-11 00:00:00", "click", 0.0),   # last   -> 40
        (5, 1, "2024-01-12 00:00:00", "purchase", 100.0),
        # 1-touch journey, value 10: all credit to the view
        (6, 2, "2024-01-10 00:00:00", "view", 0.0),
        (7, 2, "2024-01-11 00:00:00", "purchase", 10.0),
    ]
    d = _events_parquet(rows, "kmdb_attr_pos_")
    out = {
        r["touch_type"]: (r["credit"], r["n_touches"])
        for r in catalog.QUERIES["attribution_position"](spark, d).collect()
    }
    # clicks: 40 (first) + 40 (last) = 80; views: 10+10 middles + 10
    # one-touch journey = 30
    assert out["click"] == (80.0, 2)
    assert out["view"] == (30.0, 3)


def test_attribution_time_decay_weights(spark):
    import math

    from kissmetrics_to_database_spark.plans import catalog

    rows = [
        # touches exactly 7.0 and 3.5 half-lives... use 7d and 3.5d:
        # w(7d) = 0.25, w(3.5d) = 0.5 -> click share 1/3, view 2/3
        (1, 1, "2024-01-05 00:00:00", "click", 0.0),   # age 7d  -> 0.25
        (2, 1, "2024-01-08 12:00:00", "view", 0.0),    # age 3.5d-> 0.5
        (3, 1, "2024-01-12 00:00:00", "purchase", 90.0),
    ]
    d = _events_parquet(rows, "kmdb_attr_decay_")
    out = {
        r["touch_type"]: (r["credit"], r["n_touches"])
        for r in catalog.QUERIES["attribution_time_decay"](
            spark, d
        ).collect()
    }
    # click: 90 * .25/.75 = 30; view: 90 * .5/.75 = 60
    assert out["click"] == (30.0, 1)
    assert out["view"] == (60.0, 1)


def test_attribution_readouts_partition_order_proof(spark):
    """r10, VERDICT r9 #1: the three attribution credit readouts are
    exact BIGINT micro-unit sums (each per-touch credit rounds once
    pre-sum), so they must be bit-identical across partition layouts.
    The float-sum formulation this replaces flips a 2-dp half-cent
    boundary when spark.sql.shuffle.partitions changes — the class
    that produced round 7's only red row."""
    from kissmetrics_to_database_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    for name in (
        "attribution_linear",
        "attribution_position",
        "attribution_time_decay",
    ):
        q = catalog.QUERIES[name]
        runs = []
        try:
            for n in ("1", "3", "8", "17", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                runs.append([tuple(r) for r in q(spark, sf).collect()])
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        for other in runs[1:]:
            assert other == runs[0], name
