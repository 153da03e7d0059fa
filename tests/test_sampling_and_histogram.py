"""Deterministic weighted sampling (A-ES) + histogram quantiles."""

from __future__ import annotations

import hashlib
import math

from kissmetrics_to_database_spark.operators import sampling, sketches


def _u(doc_id) -> float:
    v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
    return (v + 0.5) / float(1 << 48)


def test_weighted_sample_matches_python_reference(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = sampling.weighted_priority_sample(df, "doc_id", "w", k=10).collect()

    keys = sorted(
        ((round(math.log(_u(i)) / w, 6), i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["doc_id"], r["weight"], r["wkey"], r["rank"]) for r in out] == [
        (i, w, k, rk + 1) for rk, (k, i, w) in enumerate(keys)
    ]


def test_weighted_sample_biases_toward_heavy_weights(spark):
    # 200 light (w=1) + 200 heavy (w=10): heavy rows should dominate
    # the sample (expected inclusion ~10:1 per A-ES)
    rows = [(i, 1.0) for i in range(200)] + [(i + 200, 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = sampling.weighted_priority_sample(df, "doc_id", "w", k=40).collect()
    heavy = sum(1 for r in out if r["doc_id"] >= 200)
    assert heavy > 28  # E[heavy] ≈ 36; far above the 20 of unweighted


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = sampling.weighted_priority_sample(df, "doc_id", "w", k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 5}


def test_weighted_sample_stable_under_appends(spark):
    # adding rows never changes the KEY of an existing row — the
    # incremental-stability contract
    base = [(i, float(i + 1)) for i in range(20)]
    df1 = spark.createDataFrame(base, ["doc_id", "w"])
    df2 = spark.createDataFrame(base + [(100 + i, 3.0) for i in range(20)], ["doc_id", "w"])
    k1 = {
        r["doc_id"]: r["wkey"]
        for r in sampling.weighted_priority_sample(df1, "doc_id", "w", 20).collect()
    }
    k2 = {
        r["doc_id"]: r["wkey"]
        for r in sampling.weighted_priority_sample(df2, "doc_id", "w", 40).collect()
        if r["doc_id"] < 100
    }
    assert k1 == k2


# ---------------------------------------------------------------------------


def _hist_python(vals, ps, bins=256):
    mn, mx, n = min(vals), max(vals), len(vals)
    if mx == mn:
        return {p: round(mn, 6) for p in ps}
    w = (mx - mn) / bins
    counts: dict[int, int] = {}
    for v in vals:
        b = min(bins - 1, int(math.floor((v - mn) / w)))
        counts[b] = counts.get(b, 0) + 1
    out = {}
    for p in ps:
        t = p * n
        cum = 0
        for b in sorted(counts):
            if cum + counts[b] >= t:
                out[p] = round(mn + b * w + (t - cum) / counts[b] * w, 6)
                break
            cum += counts[b]
    return out


def test_histogram_quantiles_match_python_reference(spark):
    vals = [((i * 37) % 101) / 3.0 for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    ps = (0.5, 0.95, 0.99)
    out = {
        r["p"]: r["est"]
        for r in sketches.histogram_quantiles(df, "grp", "v", ps).collect()
    }
    assert out == _hist_python(vals, ps)


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    vals = [math.sin(i) * 50 + 50 for i in range(2000)]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    out = sketches.histogram_quantiles(df, "grp", "v", (0.5, 0.95)).collect()
    width = (max(vals) - min(vals)) / 256
    sv = sorted(vals)
    for r in out:
        exact = sv[min(len(sv) - 1, int(r["p"] * len(sv)))]
        assert abs(r["est"] - exact) <= 2 * width


def test_histogram_quantiles_constant_group(spark):
    df = spark.createDataFrame([("g", 7.25)] * 30, ["grp", "v"])
    out = sketches.histogram_quantiles(df, "grp", "v", (0.5, 0.99)).collect()
    assert all(r["est"] == 7.25 for r in out)


def test_histogram_quantiles_multiple_groups_independent(spark):
    rows = [("a", float(i)) for i in range(100)] + [("b", float(i * 10)) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {
        (r["grp"], r["p"]): r["est"]
        for r in sketches.histogram_quantiles(df, "grp", "v", (0.5,)).collect()
    }
    assert abs(out[("a", 0.5)] - 49.5) < 1.0
    assert abs(out[("b", 0.5)] - 495.0) < 10.0


def test_temporal_split_audit_hand_computed(spark):
    from datetime import datetime

    from kissmetrics_to_database_spark.operators import sampling

    rows = [
        (1, datetime(2024, 1, 1)),   # train only
        (2, datetime(2024, 1, 1)), (2, datetime(2024, 2, 1)),  # leaks
        (3, datetime(2024, 2, 2)),   # eval only
        (None, datetime(2024, 2, 3)),  # null entity dropped
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    r = sampling.temporal_split_audit(df, "2024-01-15 00:00:00").collect()[0]
    assert (r["train_rows"], r["eval_rows"]) == (2, 2)
    assert (r["train_entities"], r["eval_entities"]) == (2, 2)
    assert r["leaking_entities"] == 1
    assert r["leakage_ratio"] == 0.5
