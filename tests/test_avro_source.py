"""Distributed Avro data-file scan + HLL pairwise-overlap operator."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kissmetrics_to_database_spark.functions import avroc
from kissmetrics_to_database_spark.sources import avro_files


def _write_shards(tmp_path, n_shards=3):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
        ],
    }
    for s in range(n_shards):
        recs = [
            {"id": s * 10 + i, "name": f"n{s}_{i}", "score": i / 4.0,
             "ok": i % 2 == 0}
            for i in range(4)
        ]
        with open(tmp_path / f"p-{s}.avro", "wb") as f:
            f.write(avroc.write_container(schema, recs))
    return str(tmp_path)


def test_read_avro_files_inferred(spark, tmp_path):
    path = _write_shards(tmp_path)
    df = avro_files.read_avro_files(spark, path)
    assert dict(df.dtypes) == {
        "id": "bigint", "name": "string", "score": "double", "ok": "boolean",
    }
    rows = df.orderBy("id").collect()
    assert len(rows) == 12
    assert rows[0]["id"] == 0 and rows[-1]["id"] == 23
    assert rows[1]["score"] == 0.25


def test_read_avro_files_explicit_schema(spark, tmp_path):
    path = _write_shards(tmp_path, n_shards=1)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )
    df = avro_files.read_avro_files(spark, path, schema=schema)
    assert df.count() == 4


def test_infer_rejects_nested(tmp_path):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": {"type": "array", "items": "long"}}
        ],
    }
    p = tmp_path / "n.avro"
    with open(p, "wb") as f:
        f.write(avroc.write_container(schema, [{"a": [1]}]))
    with pytest.raises(ValueError, match="nested avro type"):
        avro_files.infer_avro_schema(str(p))


def test_hll_pairwise_overlap_inclusion_exclusion(spark):
    from kissmetrics_to_database_spark.operators import sketches

    # groups: A = users 0..59, B = users 30..89 (overlap 30), C disjoint
    rows = (
        [("A", u) for u in range(60)]
        + [("B", u) for u in range(30, 90)]
        + [("C", u) for u in range(200, 220)]
    )
    df = spark.createDataFrame(rows, "g string, u long")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in sketches.hll_pairwise_overlap(df, "g", "u").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    # HLL at m=256 on n=60/90: estimates within ~20%; the union must
    # sit between max(single) and sum(singles)
    assert ab["hll_union"] >= max(ab["hll_a"], ab["hll_b"]) - 1e-6
    assert ab["hll_union"] <= ab["hll_a"] + ab["hll_b"] + 1e-6
    assert 10 <= ab["est_overlap"] <= 55  # true 30
    # disjoint pairs: union ~ sum, overlap estimate near 0
    ac = out[("A", "C")]
    assert abs(ac["est_overlap"]) <= 12  # true 0, sketch noise only
    # exact identity check: inclusion-exclusion from the reported cols
    for r in out.values():
        assert (
            abs((r["hll_a"] + r["hll_b"] - r["hll_union"]) - r["est_overlap"])
            < 1e-6
        )


def test_hll_pairwise_overlap_pipe_in_group_values(spark):
    """r10 ADVICE fix: group values containing the old '|' pack
    delimiter (and non-string group types) survive — the composite
    pair key now stays real columns through the estimate instead of
    a concat/split round trip that mis-split and dropped rows."""
    from kissmetrics_to_database_spark.operators import sketches

    rows = (
        [("a|x", u) for u in range(40)]
        + [("b|y|z", u) for u in range(20, 60)]
    )
    df = spark.createDataFrame(rows, "g string, u long")
    out = sketches.hll_pairwise_overlap(df, "g", "u").collect()
    assert len(out) == 1
    [r] = out
    assert (r["group_a"], r["group_b"]) == ("a|x", "b|y|z")
    assert r["hll_union"] >= max(r["hll_a"], r["hll_b"]) - 1e-6
    # integer group keys round-trip with their type intact
    idf = spark.createDataFrame(
        [(7, u) for u in range(30)] + [(11, u) for u in range(15, 45)],
        "g long, u long",
    )
    [ri] = sketches.hll_pairwise_overlap(idf, "g", "u").collect()
    assert (ri["group_a"], ri["group_b"]) == (7, 11)
    assert isinstance(ri["group_a"], int)


def test_union_branch_by_value_type():
    """r10 ADVICE fix: multi-branch unions route by Python value
    type, not null-ness; unmatched values raise a clear ValueError."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "v", "type": ["null", "long", "string"]},
            {"name": "w", "type": ["null", "double"]},
        ],
    }
    recs = [
        {"v": None, "w": None},
        {"v": 42, "w": 1.5},
        {"v": "forty-two", "w": 3},  # int promotes to the double branch
        {"v": -7, "w": 0.0},
    ]
    _, back = avroc.read_container(avroc.write_container(schema, recs))
    assert back == [
        {"v": None, "w": None},
        {"v": 42, "w": 1.5},
        {"v": "forty-two", "w": 3.0},
        {"v": -7, "w": 0.0},
    ]
    # booleans never leak into int/long branches
    bschema = {
        "type": "record",
        "name": "b",
        "fields": [{"name": "x", "type": ["long", "boolean"]}],
    }
    _, bb = avroc.read_container(
        avroc.write_container(bschema, [{"x": True}, {"x": 5}])
    )
    assert bb == [{"x": True}, {"x": 5}]
    with pytest.raises(ValueError, match="no union branch"):
        avroc.write_container(schema, [{"v": 1.25, "w": None}])
