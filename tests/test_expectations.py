"""Data-quality expectation suite: one-scan conditional aggregates,
NULL semantics per check, referential containment, threshold gating,
and the single-job plan shape."""

import pytest

from kissmetrics_to_database_spark.operators.expectations import (
    expectation_report,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", "O", 10.0),
            (2, "b@y.com", "F", 0.0),
            (3, None, "O", -5.0),
            (4, "not-an-email", "Z", 7.5),
            (4, "d@z.com", "O", None),
        ],
        "id long, email string, status string, amount double",
    )


def _by_check(rows):
    return {(r["check"], r["column"]): r for r in rows}


def test_single_table_checks(spark, df):
    rep = expectation_report(
        df,
        [
            {"check": "completeness", "column": "email",
             "threshold": 0.9},
            {"check": "uniqueness", "column": "id"},
            {"check": "accepted_values", "column": "status",
             "values": ["O", "F"], "threshold": 0.8},
            {"check": "non_negative", "column": "amount"},
            {"check": "matches_regex", "column": "email",
             "pattern": r"^[^@]+@[^@]+$", "threshold": 0.75},
        ],
        table="t",
    ).collect()
    got = _by_check(rep)
    c = got[("completeness", "email")]
    assert (c["n_rows"], c["n_good"], c["passed"]) == (5, 4, False)
    assert c["ratio"] == 0.8
    u = got[("uniqueness", "id")]
    assert (u["n_rows"], u["n_good"], u["passed"]) == (5, 4, False)
    a = got[("accepted_values", "status")]
    assert (a["n_rows"], a["n_good"], a["passed"]) == (5, 4, True)
    # NULL amount is NOT a domain violation (counted out of n_rows)
    n = got[("non_negative", "amount")]
    assert (n["n_rows"], n["n_good"], n["passed"]) == (4, 3, False)
    r = got[("matches_regex", "email")]
    assert (r["n_rows"], r["n_good"], r["passed"]) == (4, 3, True)
    assert all(row["table"] == "t" for row in rep)


def test_referential_check(spark, df):
    dim = spark.createDataFrame([(1,), (2,), (4,)], "key long")
    rep = expectation_report(
        df,
        [
            {"check": "referential", "column": "id",
             "ref": (dim, "key"), "threshold": 0.8},
        ],
    ).collect()
    row = rep[0]
    # id=3 missing from dim; the duplicated id=4 counts twice
    assert (row["n_rows"], row["n_good"]) == (5, 4)
    assert row["ratio"] == 0.8 and bool(row["passed"]) is True


def test_empty_table_ratio_is_one(spark):
    empty = spark.createDataFrame([], "x long")
    rep = expectation_report(
        empty, [{"check": "completeness", "column": "x"}]
    ).collect()
    assert rep[0]["ratio"] == 1.0 and bool(rep[0]["passed"]) is True


def test_unknown_check_raises(spark, df):
    with pytest.raises(ValueError, match="unknown check"):
        expectation_report(
            df, [{"check": "sorted", "column": "id"}]
        ).collect()


def test_single_scan_plan(spark, df):
    """All non-referential checks fold into ONE aggregate over ONE
    scan: the physical plan has exactly one scan of the input."""
    rep = expectation_report(
        df,
        [
            {"check": "completeness", "column": "email"},
            {"check": "uniqueness", "column": "id"},
            {"check": "non_negative", "column": "amount"},
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    # exactly one scan of the input feeding one aggregate, fanned
    # out by explode — not one scan per check
    assert plan.count("LogicalRDD") == 1
    assert plan.count("Aggregate") >= 1
