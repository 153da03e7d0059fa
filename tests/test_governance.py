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
