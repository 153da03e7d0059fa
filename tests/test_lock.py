from __future__ import annotations

import pytest

from kissmetrics_to_database_spark.sources.lock import AlreadyLockedError, PipelineLock


def test_lock_acquire_release(tmp_path):
    p = tmp_path / "run.lock"
    with PipelineLock(p):
        assert p.exists()
        with pytest.raises(AlreadyLockedError):
            with PipelineLock(p):
                pass
    assert not p.exists()


def test_stale_lock_reclaimed(tmp_path):
    p = tmp_path / "run.lock"
    p.write_text("999999999")  # pid that cannot exist
    with PipelineLock(p):
        assert p.exists()
    assert not p.exists()


def test_foreign_garbage_lock_not_reclaimed(tmp_path):
    p = tmp_path / "run.lock"
    p.write_text("not-a-pid")
    with pytest.raises(AlreadyLockedError):
        with PipelineLock(p):
            pass
    assert p.exists()  # untouched
