"""k-anonymity / l-diversity audit semantics."""

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import governance


def test_k_anonymity_flags(spark):
    rows = (
        [("a", 1, u) for u in (1, 2, 3, 4, 5)]        # k ok, l ok
        + [("b", 1, 9)] * 6                            # k ok, l FAIL (1 user)
        + [("c", 1, u) for u in (1, 2, 3)]             # k FAIL, l ok
    )
    df = spark.createDataFrame(rows, "qt string, qd int, user long")
    out = {
        (r["qt"], r["qd"]): r
        for r in governance.k_anonymity_audit(
            df, ["qt", "qd"], "user", k=5, l_div=3
        ).collect()
    }
    assert set(out) == {("b", 1), ("c", 1)}
    assert out[("b", 1)]["k_anonymous"] and not out[("b", 1)]["l_diverse"]
    assert not out[("c", 1)]["k_anonymous"] and out[("c", 1)]["l_diverse"]
    full = governance.k_anonymity_audit(
        df, ["qt", "qd"], "user", k=5, l_div=3, violations_only=False
    )
    assert full.count() == 3


def _py_laplace(key: str, scale: float) -> float:
    import hashlib
    import math

    v = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
    u = (v + 0.5) / float(1 << 48)
    c = u - 0.5
    s = 0.0 if c == 0 else (1.0 if c > 0 else -1.0)
    return -scale * s * math.log(1.0 - 2.0 * abs(c))


def test_dp_noisy_counts_exact_replay_and_clamp(spark):
    rows = [("a", "d1")] * 7 + [("b", "d1")] * 2 + [("c", "d2")] * 40
    df = spark.createDataFrame(rows, "t string, d string")
    out = {
        (r["t"], r["d"]): r
        for r in governance.dp_noisy_counts(
            df, ["t", "d"], epsilon=0.5, release_key="sekrit"
        ).collect()
    }
    true = {("a", "d1"): 7, ("b", "d1"): 2, ("c", "d2"): 40}
    assert set(out) == set(true)
    for (t, d), n in true.items():
        expect = max(0, round(n + _py_laplace(f"sekrit|{t}|{d}", 2.0)))
        got = out[(t, d)]
        assert got["noisy_count"] == expect, (t, d)
        assert got["epsilon"] == 0.5
        assert got["noisy_count"] >= 0
    # determinism: a second run under the same secret key is
    # bit-identical (release replay reuses the draw instead of
    # burning more epsilon)
    again = {
        (r["t"], r["d"]): r["noisy_count"]
        for r in governance.dp_noisy_counts(
            df, ["t", "d"], epsilon=0.5, release_key="sekrit"
        ).collect()
    }
    assert again == {k: v["noisy_count"] for k, v in out.items()}


def test_dp_noisy_counts_key_changes_noise_and_is_required(spark):
    """ADVICE r9 high: the draw must depend on the secret key —
    a different key yields a different release, and omitting /
    emptying the key is refused (label-only noise is recomputable
    by an adversary)."""
    import pytest

    rows = [("a", "d1")] * 7 + [("c", "d2")] * 40
    df = spark.createDataFrame(rows, "t string, d string")

    def release(key):
        return {
            (r["t"], r["d"]): r["noisy_count"]
            for r in governance.dp_noisy_counts(
                df, ["t", "d"], epsilon=0.5, release_key=key
            ).collect()
        }

    assert release("key-one") != release("key-two")
    with pytest.raises(ValueError, match="release_key"):
        governance.dp_noisy_counts(
            df, ["t", "d"], epsilon=0.5, release_key=""
        )
    with pytest.raises(TypeError):
        governance.dp_noisy_counts(df, ["t", "d"], epsilon=0.5)


def test_dp_noisy_counts_clamps_negative_to_zero(spark):
    # hunt a key whose Laplace draw is below -1 so a count of 1 clamps
    import itertools

    key = next(
        k
        for k in (f"x{i}" for i in itertools.count())
        if _py_laplace(f"sekrit|{k}|d", 2.0) < -1.5
    )
    df = spark.createDataFrame([(key, "d")], "t string, d string")
    [r] = governance.dp_noisy_counts(
        df, ["t", "d"], epsilon=0.5, release_key="sekrit"
    ).collect()
    assert r["noisy_count"] == 0
