"""Iceberg-protocol reader round-trips (from-spec Avro manifests,
snapshot resolution, time travel, delete handling, declared
boundaries) plus Avro codec edge cases."""

import json
import os

import pandas as pd
import pytest

from kissmetrics_to_database_spark.functions import avroc
from kissmetrics_to_database_spark.sources import iceberg as ib

FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "val", "required": False, "type": "string"},
]


def _pdf(ids):
    return pd.DataFrame({"id": ids, "val": [f"v{i}" for i in ids]})


@pytest.fixture()
def table(tmp_path):
    w = ib.IcebergFixtureWriter(str(tmp_path / "t"), FIELDS)
    added0 = w.commit(_pdf([1, 2]))  # snapshot 1000
    w.commit(_pdf([3, 4]))  # snapshot 1001
    w.commit(_pdf([5]), remove_paths=added0, operation="overwrite")  # 1002
    return w


def test_avro_deflate_and_blocks():
    # deflate codec + multi-block containers decode per spec
    import hashlib
    import io
    import zlib

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(10)]
    blob = avroc.write_container(schema, recs)
    # rebuild by hand with deflate + two blocks
    names: dict = {}
    avroc._collect_names(schema, names)
    sync = hashlib.md5(json.dumps(schema).encode()).digest()
    out = io.BytesIO()
    out.write(avroc.MAGIC)
    avroc._encode(
        out,
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"deflate",
        },
        {},
    )
    out.write(sync)
    for chunk in (recs[:4], recs[4:]):
        block = io.BytesIO()
        for rec in chunk:
            avroc._encode(block, schema, rec, names)
        comp = zlib.compress(block.getvalue())[2:-4]  # raw per spec
        out.write(avroc._zigzag(len(chunk)))
        out.write(avroc._zigzag(len(comp)))
        out.write(comp)
        out.write(sync)
    s2, got = avroc.read_container(out.getvalue())
    assert got == recs
    _, got2 = avroc.read_container(blob)
    assert got2 == recs


def test_avro_negative_block_count():
    # negative array block count => byte size follows (spec)
    import io

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": {"type": "array", "items": "long"}}]}
    body = io.BytesIO()
    avroc._encode(body, "long", 0, {})  # placeholder, rebuilt below
    body = io.BytesIO()
    items = io.BytesIO()
    for v in (7, 8):
        items.write(avroc._zigzag(v))
    body.write(avroc._zigzag(-2))
    body.write(avroc._zigzag(len(items.getvalue())))
    body.write(items.getvalue())
    body.write(avroc._zigzag(0))
    r = avroc._Reader(body.getvalue())
    names: dict = {}
    avroc._collect_names(schema, names)
    assert avroc._decode(r, schema, names) == {"a": [7, 8]}


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_current_snapshot_applies_overwrite(spark, table):
    assert _ids(ib.read_iceberg(spark, table.path)) == [3, 4, 5]


def test_time_travel_by_snapshot_id(spark, table):
    assert _ids(ib.read_iceberg(spark, table.path, snapshot_id=1000)) == [1, 2]
    assert _ids(ib.read_iceberg(spark, table.path, snapshot_id=1001)) == [
        1, 2, 3, 4,
    ]
    with pytest.raises(ValueError, match="snapshot"):
        ib.read_iceberg(spark, table.path, snapshot_id=7)


def test_history(table):
    hist = ib.iceberg_history(table.path)
    assert [h["snapshot_id"] for h in hist] == [1002, 1001, 1000]
    assert hist[0]["operation"] == "overwrite"
    assert hist[0]["parent_snapshot_id"] == 1001
    assert hist[-1]["parent_snapshot_id"] is None


def test_delete_manifest_boundary(tmp_path):
    w = ib.IcebergFixtureWriter(str(tmp_path / "d"), FIELDS)
    w.commit(_pdf([1]))
    # flip the manifest-list entry to content=1 (v2 delete manifest)
    mlist = os.path.join(w.path, "metadata", "snap-1000.avro")
    with open(mlist, "rb") as f:
        schema, entries = avroc.read_container(f.read())
    entries[0]["content"] = 1
    with open(mlist, "wb") as f:
        f.write(avroc.write_container(schema, entries))
    with pytest.raises(ValueError, match="delete manifest"):
        ib.snapshot_files(w.path)


def test_format_version_boundary(tmp_path):
    w = ib.IcebergFixtureWriter(str(tmp_path / "v"), FIELDS)
    w.commit(_pdf([1]))
    mp = os.path.join(w.path, "metadata", "v1.metadata.json")
    meta = json.load(open(mp))
    meta["format-version"] = 3
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="format-version"):
        ib.table_metadata(w.path)
