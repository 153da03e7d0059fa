"""Reference-fidelity tests for the per-row event transform
(SURVEY.md §2.2; reference behavior cited per function)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from kissmetrics_to_database_spark.functions import events_transform as et


def test_sanitize_key():
    # helpers.php:28-35 — '-', ' ', '_' all map to '_'
    assert et.sanitize_key("a-b c_d") == "a_b_c_d"
    assert et.sanitize_key("plain") == "plain"


def test_sanitize_columns_dedupes_collisions(spark):
    # KTD:204-210 keeps the first raw key when two sanitize identically
    df = spark.createDataFrame([(1, 2, 3)], ["a-b", "a b", "ok"])
    out = et.sanitize_columns(df)
    assert out.columns == ["a_b", "ok"]
    assert out.collect() == [Row(a_b=1, ok=3)]


def test_n_not_null_and_nullation(spark):
    # ProcessFile.php:40 + KTD:281-286
    df = spark.createDataFrame(
        [("click",), ("",), (None,)], ["_n"]
    )
    out = et.with_n_not_null(df).collect()
    assert [(r["_n"], r["_n_not_null"]) for r in out] == [
        ("click", "click"),
        (None, ""),
        (None, ""),
    ]


def test_epoch_format_utc(spark):
    # KTD:289-291; determinism: UTC
    df = spark.createDataFrame([("1704067207",)], ["_t"])
    out = et.with_formatted_t(df).collect()[0]["_t"]
    expected = dt.datetime.fromtimestamp(
        1704067207, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    assert out == expected == "2024-01-01 00:00:07"


def test_fingerprint_matches_hashlib(spark):
    # KTD:293 — md5 of values concatenated with no separator, NULL → ''
    df = spark.createDataFrame(
        [("x", None, "z")], "a string, b string, c string"
    )
    out = et.with_fingerprint(df).collect()[0]["md5hash"]
    assert out == hashlib.md5(b"xz").hexdigest()


def test_load_date_fixed(spark):
    df = spark.range(1)
    out = et.with_load_date(df, "2024-06-01").collect()[0]["created_at"]
    assert str(out) == "2024-06-01"


def test_non_blank_lines(spark):
    df = spark.createDataFrame([("  ",), ("x",), ("",)], ["value"])
    assert et.non_blank_lines(df).count() == 1


def test_full_transform_pipeline(spark):
    df = spark.createDataFrame(
        [("u1", "a2", "click", "1704067207", "v")],
        ["_p", "_p2", "_n", "_t", "some-prop"],
    )
    out = et.transform_events(df, fixed_date="2024-06-01")
    row = out.collect()[0]
    assert "some_prop" in out.columns
    assert row["_n_not_null"] == "click"
    assert row["_t"] == "2024-01-01 00:00:07"
    assert str(row["created_at"]) == "2024-06-01"
    assert len(row["md5hash"]) == 32


def test_sha1_matches_hashlib(spark):
    # F2: sha1 used for identity bucketing (KTD:513) — engine keeps
    # the builtin even though the oracle-facing queries use sha2-256
    out = spark.range(1).select(F.sha1(F.lit("abc")).alias("h")).collect()[0]["h"]
    assert out == hashlib.sha1(b"abc").hexdigest()


def test_decayed_user_features_matches_python(spark):
    import datetime as dt
    import math

    rows = [
        (1, dt.datetime(2024, 1, 1), 10.0),
        (1, dt.datetime(2024, 1, 8), 20.0),   # 7 days before last
        (1, dt.datetime(2024, 1, 15), 40.0),  # the anchor
        (2, dt.datetime(2024, 3, 1), 5.0),
        (2, None, 3.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).where(
        "ts IS NOT NULL"
    )
    out = {
        r["user_id"]: r
        for r in et.decayed_user_features(df).collect()
    }
    # user 1: 40 + 20*0.5 + 10*0.25 = 52.5 exactly (whole half-lives)
    assert out[1]["n_events"] == 3
    assert abs(out[1]["decayed_value"] - 52.5) < 1e-6
    assert out[1]["last_seen_epoch"] == int(
        dt.datetime(2024, 1, 15, tzinfo=dt.timezone.utc).timestamp()
    )
    # single event: decay 0.5^0 = 1
    assert out[2]["decayed_value"] == 5.0


def test_decayed_user_features_null_rows_excluded(spark):
    import datetime as dt

    rows = [
        (None, dt.datetime(2024, 1, 1), 1.0),
        (3, dt.datetime(2024, 1, 1), None),
        (3, dt.datetime(2024, 1, 2), 2.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = et.decayed_user_features(df).collect()
    assert len(out) == 1 and out[0]["n_events"] == 1
