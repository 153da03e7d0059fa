from __future__ import annotations

import json

import pytest

from kissmetrics_to_database_spark.sources import tablelog as tl


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_versions_and_read_latest(spark, tmp_path):
    p = str(tmp_path / "t")
    assert tl.write_table(_mk(spark, 0, 10), p) == 0
    assert tl.write_table(_mk(spark, 10, 25), p) == 1
    assert tl.read_table(spark, p).count() == 25
    assert tl.read_table(spark, p, version=0).count() == 10  # time travel
    assert tl.list_versions(p) == [0, 1]


def test_snapshot_isolation_across_compaction(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 10), p)
    tl.write_table(_mk(spark, 10, 20), p)
    # reader resolves the v1 snapshot BEFORE the writer compacts
    snap = tl.read_table(spark, p, version=1)
    v2 = tl.compact_table(spark, p, target_files=1)
    assert v2 == 2
    # compaction reduced files, preserved rows
    assert tl.read_manifest(p, 2)["n_files"] == 1
    assert tl.read_table(spark, p).count() == 20
    # the pre-compaction reader still sees ITS snapshot, untouched
    assert snap.count() == 20
    assert tl.read_table(spark, p, version=1).count() == 20


def test_vacuum_retires_only_unreferenced_files(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 10), p)          # v0
    tl.write_table(_mk(spark, 10, 20), p)         # v1 (includes v0 files)
    tl.compact_table(spark, p, target_files=1)    # v2 (fresh files)
    deleted = tl.vacuum_table(p, keep_last=1)
    # v0/v1 manifests gone; their files unreferenced by v2 -> deleted
    assert tl.list_versions(p) == [2]
    assert len(deleted) > 0
    assert tl.read_table(spark, p).count() == 20
    with pytest.raises(FileNotFoundError):
        tl.read_table(spark, p, version=1)


def test_vacuum_keeps_files_shared_with_retained_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 10), p)   # v0
    tl.write_table(_mk(spark, 10, 20), p)  # v1 references v0's files too
    deleted = tl.vacuum_table(p, keep_last=1)
    # v0's files are shared with retained v1 -> nothing deleted
    assert deleted == []
    assert tl.read_table(spark, p).count() == 20


def test_tmp_manifest_invisible_to_readers(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 10), p)
    # simulate a writer crash mid-commit: a .tmp manifest exists
    (tmp_path / "t" / "_log" / "1.json.tmp").write_text(
        json.dumps({"version": 1, "files": ["/nonexistent"]})
    )
    assert tl.list_versions(p) == [0]
    assert tl.read_table(spark, p).count() == 10


def test_duplicate_version_commit_refused(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 5), p)
    with pytest.raises(RuntimeError, match="already committed"):
        tl._commit(p, 0, {"version": 0, "files": []})


def test_epoch_exactly_once_replay_and_regression(spark, tmp_path):
    p = str(tmp_path / "t")
    sink = __import__(
        "kissmetrics_to_database_spark.streaming.pipeline",
        fromlist=["tablelog_exactly_once_sink"],
    ).tablelog_exactly_once_sink(p)
    sink(_mk(spark, 0, 10), 0)
    sink(_mk(spark, 0, 10), 0)   # crash-replay of the SAME epoch
    assert tl.read_table(spark, p).count() == 10  # not 20
    sink(_mk(spark, 10, 20), 1)
    assert tl.read_table(spark, p).count() == 20
    assert tl.read_manifest(p, tl.list_versions(p)[-1])["epochs"] == [0, 1]
    with pytest.raises(ValueError, match="epoch regression"):
        sink(_mk(spark, 0, 5), 0)


def test_epoch_ledger_survives_compaction(spark, tmp_path):
    p = str(tmp_path / "t")
    tl.write_table(_mk(spark, 0, 10), p, epoch_id=0)
    tl.write_table(_mk(spark, 10, 20), p, epoch_id=1)
    tl.compact_table(spark, p, target_files=1)
    # replay of epoch 1 after compaction still recognized
    v = tl.write_table(_mk(spark, 10, 20), p, epoch_id=1)
    assert tl.read_table(spark, p).count() == 20
    assert v == tl.list_versions(p)[-1]
