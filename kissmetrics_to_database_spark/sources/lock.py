"""Single-writer lock (SURVEY.md §2.1 S10).

The reference refuses to start when a lock file exists, creates it at
startup, removes it at clean exit (reference:
src/KissmetricsToDatabase.php:47-51,101-105). Structured Streaming
gets this per-checkpoint for free; the batch pipeline keeps the same
explicit file contract, O_EXCL-atomic and stale-aware.
"""

from __future__ import annotations

import os
from pathlib import Path


class AlreadyLockedError(RuntimeError):
    pass


class PipelineLock:
    """Context manager: atomic lock-file acquisition with pid stamp.

    ``O_CREAT | O_EXCL`` makes acquisition race-free on POSIX; a lock
    whose pid no longer exists is treated as stale and reclaimed
    (the reference's manual `rm lockfile` recovery, automated).
    """

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)

    def __enter__(self) -> "PipelineLock":
        self.path.parent.mkdir(parents=True, exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if self._is_stale():
                # atomic reclaim: rename the stale file aside — only
                # ONE contender's rename succeeds, so a racing
                # process can never unlink a lock that was just
                # re-acquired by someone else
                try:
                    os.rename(self.path, f"{self.path}.stale.{os.getpid()}")
                except OSError:
                    pass  # another contender claimed it; fall through
                else:
                    Path(f"{self.path}.stale.{os.getpid()}").unlink(missing_ok=True)
                return self.__enter__()
            try:
                holder = self.path.read_text().strip() or "unknown"
            except OSError:
                holder = "unknown"
            raise AlreadyLockedError(
                f"another run holds {self.path} (pid {holder})"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
        return self

    def __exit__(self, *exc) -> None:
        self.path.unlink(missing_ok=True)

    def _is_stale(self) -> bool:
        try:
            pid = int(self.path.read_text().strip())
        except (ValueError, OSError):
            return False
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return True
        except PermissionError:
            return False
        return False
