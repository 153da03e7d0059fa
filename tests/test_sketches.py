"""Sketch operators: count-min, HyperLogLog, Bloom.

Each sketch gets (a) an exact Python-reference replication of the
md5-slice hash family — pinning the deterministic contract the DuckDB
oracles rely on — and (b) its defining probabilistic invariant: CMS
never undercounts, Bloom never false-negatives, HLL lands within the
published error envelope.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from kissmetrics_to_database_spark.operators import sketches


def _slices(value: str, k: int, nchars: int = 4) -> list[int]:
    h = hashlib.md5(value.encode()).hexdigest()
    return [int(h[nchars * j : nchars * (j + 1)], 16) for j in range(k)]


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------


def test_cms_matches_python_reference_and_never_undercounts(spark):
    vals = ["a", "b", "a", "c", "a", "b", "d"] * 3 + ["e"]
    df = spark.createDataFrame([(v,) for v in vals], ["token"])
    depth, width = 4, 64
    counters = sketches.cms_counters(df, "token", depth, width)
    items = df.distinct()
    est = {
        r["token"]: r["est_cnt"]
        for r in sketches.cms_estimate(items, counters, "token", depth, width).collect()
    }

    # python reference sketch
    ref = [[0] * width for _ in range(depth)]
    for v in vals:
        for d, s in enumerate(_slices(v, depth)):
            ref[d][s % width] += 1
    from collections import Counter

    exact = Counter(vals)
    for v, true_cnt in exact.items():
        py_est = min(ref[d][s % width] for d, s in enumerate(_slices(v, depth)))
        assert est[v] == py_est
        assert est[v] >= true_cnt  # CMS never undercounts


def test_cms_exact_when_no_collisions(spark):
    vals = [f"tok{i}" for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame([(v,) for v in vals], ["token"])
    counters = sketches.cms_counters(df, "token", depth=4, width=4096)
    est = {
        r["token"]: r["est_cnt"]
        for r in sketches.cms_estimate(
            df.distinct(), counters, "token", 4, 4096
        ).collect()
    }
    # 20 values in 4096 buckets x 4 independent rows: a collision in
    # EVERY row is vanishingly unlikely; with these fixed md5 values
    # there is none — estimates are exact.
    assert est == {f"tok{i}": i + 1 for i in range(20)}


def test_cms_unseen_value_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([("x",), ("y",)], ["token"])
    counters = sketches.cms_counters(df, "token", depth=4, width=4096)
    probe = spark.createDataFrame([("never-seen",)], ["token"])
    [r] = sketches.cms_estimate(probe, counters, "token", 4, 4096).collect()
    assert r["est_cnt"] == 0  # empty buckets floor the min at 0


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_python(values, b: int = 8) -> float:
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs: dict[int, int] = {}
    for v in set(values):
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[: b // 4], 16)
        rest = int(h[b // 4 : b // 4 + 6], 16)
        rho = 25 if rest == 0 else 25 - rest.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    zeros = m - len(regs)
    raw = alpha * m * m / z
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


@pytest.mark.parametrize("n", [5, 50, 400])
def test_hll_matches_python_reference_exactly(spark, n):
    rows = [("g", i) for i in range(n)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    [r] = sketches.hll_distinct(df, "grp", "val", b=8).collect()
    assert r["hll_n"] == round(_hll_python(range(n)), 6)


@pytest.mark.parametrize("n", [10, 100, 1000])
def test_hll_error_envelope(spark, n):
    df = spark.createDataFrame([("g", f"u{i}") for i in range(n)], ["grp", "val"])
    [r] = sketches.hll_distinct(df, "grp", "val", b=8).collect()
    # published rel. error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(r["hll_n"] - n) / n < 0.2


def test_hll_duplicates_do_not_inflate(spark):
    df = spark.createDataFrame(
        [("g", f"u{i % 7}") for i in range(500)], ["grp", "val"]
    )
    [r] = sketches.hll_distinct(df, "grp", "val", b=8).collect()
    assert r["hll_n"] == round(_hll_python([f"u{i}" for i in range(7)]), 6)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_python_parity(spark):
    build_vals = [f"doc-{i}" for i in range(50)]
    probe_vals = build_vals + [f"other-{i}" for i in range(200)]
    bits, k = 1 << 12, 4
    build = spark.createDataFrame([(v,) for v in build_vals], ["text"])
    probes = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe_vals)], ["pid", "text"]
    )
    bitmap = sketches.bloom_bitmap(build, "text", bits, k)
    out = {
        r["pid"]: r["maybe_seen"]
        for r in sketches.bloom_probe(probes, bitmap, "pid", "text", bits, k).collect()
    }

    # python reference bitmap
    ref_bits = set()
    for v in build_vals:
        ref_bits.update(s % bits for s in _slices(v, k))
    for i, v in enumerate(probe_vals):
        expected = all(s % bits in ref_bits for s in _slices(v, k))
        assert out[i] == expected
    # the invariant: every built value reports present
    assert all(out[i] for i in range(len(build_vals)))


def test_bloom_false_positive_rate_sane(spark):
    bits, k, n = 1 << 12, 4, 100
    build = spark.createDataFrame([(f"in-{i}",) for i in range(n)], ["text"])
    probes = spark.createDataFrame(
        [(i, f"out-{i}") for i in range(1000)], ["pid", "text"]
    )
    bitmap = sketches.bloom_bitmap(build, "text", bits, k)
    out = sketches.bloom_probe(probes, bitmap, "pid", "text", bits, k)
    fp = out.where("maybe_seen").count() / 1000
    # theoretical (1 - e^{-kn/m})^k ~ 0.008 at these params; allow 4x
    assert fp < 0.035


def test_bloom_bitmap_is_bounded(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(5000)], ["text"])
    bm = sketches.bloom_bitmap(df, "text", bits=1 << 10, k=4)
    assert bm.count() <= (1 << 10) // 32
